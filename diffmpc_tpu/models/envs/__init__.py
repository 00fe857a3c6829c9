from .cartpole import CartpoleDx
from .pendulum import PendulumDx

__all__ = ["CartpoleDx", "PendulumDx"]
