"""BPJDet detector weight import (torch .pt -> flax variables)."""

from __future__ import annotations

import numpy as np


def load_bpjdet_weights(model, weights_path: str):
    """Load a BPJDet YOLOv5 checkpoint into the flax model's variables.

    Accepts either a torch .pt checkpoint (converted via ordered structural
    matching, models/convert.py) or a pre-converted .npz of the flax tree.
    """
    import jax
    import jax.numpy as jnp

    template = model.init({"params": jax.random.key(0)},
                          jnp.zeros((1, 128, 128, 3)), train=False)
    if weights_path.endswith(".npz"):
        from flax.traverse_util import unflatten_dict

        data = np.load(weights_path)
        flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
        return unflatten_dict(flat)

    from semiuhpe_tpu.models.convert import convert_state_dict, load_torch_checkpoint

    state_dict = load_torch_checkpoint(weights_path)
    return convert_state_dict(template, state_dict)


def save_variables_npz(variables, path: str) -> None:
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(variables).items()}
    np.savez(path, **flat)
