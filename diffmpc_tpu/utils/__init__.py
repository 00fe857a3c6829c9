from .batch import (
    bdiag,
    bdot,
    bger,
    bmv,
    bquad,
    btrans,
    detach,
    eclamp,
    symmetrize,
)

__all__ = [
    "bdiag",
    "bdot",
    "bger",
    "bmv",
    "bquad",
    "btrans",
    "detach",
    "eclamp",
    "symmetrize",
]
