"""muscle_tpu — TPU-native multiple sequence alignment framework.

A from-scratch re-design of the capabilities of MUSCLE v5 (reference:
rcedgar/muscle) for TPU hardware: the pair-HMM / MEA / consistency compute
path runs as batched JAX/XLA/Pallas programs on device, the combinatorial
host path (trees, join orders, clustering, I/O) is Python/NumPy, and
multi-chip scale-out uses jax.sharding over a device Mesh.

Top-level API:
    align(seqs, **opts)    -> aligned MultiSequence  (reference: -align)
    super5(seqs, **opts)   -> aligned MultiSequence  (reference: -super5)
    qscore(test, ref)      -> (Q, TC)                (reference: -qscore)
"""

__version__ = "0.1.0"

from .sequence import Sequence, MultiSequence  # noqa: F401


def align(*args, **kwargs):
    from .pipeline.mpc import align as _align
    return _align(*args, **kwargs)


def super5(*args, **kwargs):
    from .pipeline.super5 import super5 as _super5
    return _super5(*args, **kwargs)


def qscore(*args, **kwargs):
    from .qscore import qscore as _qscore
    return _qscore(*args, **kwargs)
