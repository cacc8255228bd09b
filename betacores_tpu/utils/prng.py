"""Explicit PRNG-key discipline.

The reference seeds a global ``np.random`` stream once per trial (reference:
examples/zellner_logreg/main.py:22) so every component's randomness is
implicitly coupled. Here every stochastic function takes a ``jax.random``
key; these helpers keep key management terse.
"""

from __future__ import annotations

import jax


def key_from_seed(seed: int | jax.Array) -> jax.Array:
    return jax.random.key(seed) if isinstance(seed, int) else seed


class KeySequence:
    """Stateful convenience wrapper for eager (non-jit) code paths."""

    def __init__(self, seed: int | jax.Array = 0):
        self._key = key_from_seed(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def __call__(self) -> jax.Array:
        return self.next()
