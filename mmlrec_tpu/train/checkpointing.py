"""Checkpoint save/restore for Trainer (orbax) + runtime-layout conversion.

Split out of train/trainer.py (VERDICT r4 #7, no behavior change).  Two
surfaces:

* model checkpoints (``save_checkpoint``/``restore_checkpoint``) — best
  variables only, honoring the reference's ``save_config`` (which the
  reference defines but never reads, SURVEY §5);
* full training-state checkpoints (``save_training_state`` /
  ``restore_training_state``) — params + optimizer state + epoch for
  mid-run resume; the reference has no on-disk checkpointing at all.

Checkpoints always store the platform-independent SPLIT layout: a
stacked-container state (fat [2Vp, W] table param + FoldedState) converts
to (table plane, unpacked split mu/nu) at save so a TPU-written
checkpoint restores into any table_container / table_update configuration
(ADVICE r3); all conversions are slices/bitcasts — bit-exact round trip.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp


def state_ckpt_dir(trainer, path: str) -> str:
    return os.path.abspath(
        os.path.join(
            path,
            f"{trainer.model_name}_{trainer.task_name}_seed{trainer.seed}_state",
        )
    )


def state_to_split_layout(trainer, state):
    """Training state in the platform-independent SPLIT layout (see module
    docstring)."""
    from .sparse_embedding import (
        SparseAdamFoldedState,
        SparseAdamState,
        to_split_state,
        unpack_monu,
    )

    out = dict(state)
    topt = state.get("table_opt")
    if isinstance(topt, SparseAdamFoldedState):
        rest, fat = trainer._without_table(state["params"])
        from .sparse_embedding import split_stacked_planes

        table, monu = split_stacked_planes(
            fat, getattr(trainer, "_stacked_shards", 1)
        )
        mu, nu = unpack_monu(monu)
        out["params"] = trainer._with_table(rest, table)
        out["table_opt"] = SparseAdamState(mu=mu, nu=nu, count=topt.count)
    elif topt is not None:
        out["table_opt"] = to_split_state(topt)
    return out


def state_to_runtime_layout(trainer, state):
    """Inverse of state_to_split_layout for THIS trainer's runtime
    (refold the fat param under a stacked container, re-pack bf16
    moments under packed split)."""
    from .sparse_embedding import (
        SparseAdamFoldedState,
        SparseAdamState,
        fold_stacked_planes,
        pack_monu,
        to_runtime_state,
    )

    out = dict(state)
    topt = state.get("table_opt")
    if (
        getattr(trainer, "table_container", "split") == "stacked"
        and isinstance(topt, SparseAdamState)
    ):
        rest, table = trainer._without_table(state["params"])
        fat = fold_stacked_planes(
            table,
            pack_monu(
                topt.mu.astype(jnp.bfloat16),
                topt.nu.astype(jnp.bfloat16),
            ),
            getattr(trainer, "_stacked_shards", 1),
        )
        out["params"] = trainer._with_table(rest, fat)
        out["table_opt"] = SparseAdamFoldedState(count=topt.count)
    elif topt is not None:
        out["table_opt"] = to_runtime_state(
            topt, getattr(trainer, "_packed_moments", False)
        )
    return out


def save_training_state(trainer, path: str, epoch: Optional[int] = None) -> str:
    import orbax.checkpoint as ocp

    if getattr(trainer, "_train_state", None) is None:
        raise ValueError("no training state; call fit() first")
    epoch = epoch if epoch is not None else len(trainer.history)

    payload_state = {
        k: v
        for k, v in trainer._train_state.items()
        if v is not None and k != "epoch_step"  # transient counter
    }
    # checkpoints store the platform-independent split layout
    payload_state = state_to_split_layout(trainer, payload_state)
    payload = {
        "state": payload_state,
        "epoch": jnp.asarray(epoch, jnp.int32),
    }
    full = state_ckpt_dir(trainer, path)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(full, payload, force=True)
    checkpointer.wait_until_finished()
    return full


def restore_training_state(trainer, path: str, template_state):
    import orbax.checkpoint as ocp

    tmpl_state = {k: v for k, v in template_state.items() if v is not None}
    tmpl_state = state_to_split_layout(trainer, tmpl_state)
    template = {
        "state": tmpl_state,
        "epoch": jnp.zeros((), jnp.int32),
    }
    checkpointer = ocp.StandardCheckpointer()
    try:
        restored = checkpointer.restore(path, template)
        converted = True
    except Exception:
        # pre-migration checkpoints stored the runtime (possibly
        # packed / stacked) layout directly — retry with the
        # unconverted template
        template["state"] = {
            k: v for k, v in template_state.items() if v is not None
        }
        restored = checkpointer.restore(path, template)
        converted = False
    state = dict(template_state)
    state.update(restored["state"])
    if converted:
        state = state_to_runtime_layout(trainer, state)
    return state, int(restored["epoch"])


def save_checkpoint(trainer, path: str) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(
            path, f"{trainer.model_name}_{trainer.task_name}_seed{trainer.seed}"
        )
    )
    ckpt = trainer.best_variables or trainer.variables
    # canonicalize: drop empty collections so save/restore templates
    # agree regardless of whether fit() has run
    ckpt = {k: v for k, v in ckpt.items() if v}
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, ckpt, force=True)
    checkpointer.wait_until_finished()
    return path


def restore_checkpoint(trainer, path: str):
    import orbax.checkpoint as ocp

    if trainer.variables is None:
        raise ValueError("call fit() or init variables before restore")
    template = {k: v for k, v in trainer.variables.items() if v}
    checkpointer = ocp.StandardCheckpointer()
    restored = checkpointer.restore(path, template)
    for k in trainer.variables:
        if k not in restored:
            restored[k] = trainer.variables[k]
    trainer.variables = restored
    trainer.best_variables = trainer.variables
    return trainer
