from .dynamics import (
    AffineDynamics,
    CtrlPassthroughDynamics,
    Dynamics,
    NNDynamics,
    autodiff_grad_input,
)
from .envs.acrobot import AcrobotDx
from .envs.cartpole import CartpoleDx
from .envs.pendulum import PendulumDx
from .envs.quadrotor import QuadrotorDx

__all__ = [
    "AcrobotDx",
    "AffineDynamics",
    "CartpoleDx",
    "CtrlPassthroughDynamics",
    "Dynamics",
    "NNDynamics",
    "PendulumDx",
    "QuadrotorDx",
    "autodiff_grad_input",
]
