from .acrobot import AcrobotDx
from .cartpole import CartpoleDx
from .pendulum import PendulumDx
from .quadrotor import QuadrotorDx

__all__ = ["AcrobotDx", "CartpoleDx", "PendulumDx", "QuadrotorDx"]
