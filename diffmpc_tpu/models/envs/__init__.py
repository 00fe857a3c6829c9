from .cartpole import CartpoleDx
from .pendulum import PendulumDx
from .quadrotor import QuadrotorDx

__all__ = ["CartpoleDx", "PendulumDx", "QuadrotorDx"]
