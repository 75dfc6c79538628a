"""Train state: params + optimizer state + PRNG, as one donated pytree."""
from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx, rng):
        return cls(step=0, params=params, opt_state=tx.init(params), rng=rng)
