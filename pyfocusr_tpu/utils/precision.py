"""Precision utilities.

TPU's MXU runs f32 matmuls as bf16 passes by DEFAULT, which silently destroys
the numerics this library depends on (Lanczos reorthogonalization, randomized
kernel eigendecompositions, distance-matrix cancellation): observed on-device
as exploding CPD warps and collapsed correspondences while the identical code
was exact on CPU.  Every jitted entry point therefore traces under
``jax.default_matmul_precision("highest")``; call sites that deliberately
trade accuracy for speed (the crude ICP NN search) override with an explicit
``precision=`` argument, which takes priority over the context default.
"""

import functools

import jax

__all__ = ["f32_matmuls"]


def f32_matmuls(fn):
    """Decorator: trace ``fn`` under highest (true f32) matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
