"""Weight/filter-state checkpointing (flax msgpack serialization).

The reference's model checkpoint path is torch .pth.tar -> TorchScript
tracing (trace_model.py:12-46); here weights are a flax pytree serialized
with msgpack (orbax would also work; msgpack keeps single-file simplicity).
Filter states are tiny pytrees — ``save_filter_state`` enables resumable
batched evaluation (SURVEY.md §5.4 rebuild note).
"""

from __future__ import annotations

import numpy as np
from flax import serialization

from cuahn_vio.filter.state import FilterState


def save_params(path: str, params) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    """Load weights into the structure of ``template`` (shape-checked)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_filter_state(path: str, state: FilterState) -> None:
    np.savez(
        path,
        **{
            k: np.asarray(v)
            for k, v in state._asdict().items()
            if v is not None  # optional bias block may be absent
        },
    )


def load_filter_state(path: str) -> FilterState:
    import jax.numpy as jnp

    d = np.load(path)
    return FilterState(**{k: jnp.asarray(d[k]) for k in d.files})
