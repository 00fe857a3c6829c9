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
from .envs.vehicle import VehicleDx

__all__ = [
    "AcrobotDx",
    "AffineDynamics",
    "CartpoleDx",
    "CtrlPassthroughDynamics",
    "Dynamics",
    "NNDynamics",
    "PendulumDx",
    "QuadrotorDx",
    "VehicleDx",
    "autodiff_grad_input",
]
