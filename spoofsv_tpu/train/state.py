"""Train-state pytrees (checkpointable with orbax).

Keeps the same logical contents as the reference checkpoints: generator and
discriminator params, both optimizer states, step counter
(``train/adversarial_wasserstein_gp.py:398-437``). Loss-history logs live
host-side in the metrics logger, not in the device pytree.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


@flax.struct.dataclass
class AdvTrainState:
    step: jnp.ndarray
    gen_params: Any
    gen_opt_state: Any
    disc_params: Any
    disc_opt_state: Any
