"""Tensor parallelism for the fusion model over the mesh "model" axis.

The reference trains its fusion model on one GPU (reference train.py:32,321)
— TP is new capability, not a port. The layout is the standard Megatron
split expressed as GSPMD shardings on the plain pytree params:

  - Q/K/V and evidence key/value projections: column-sharded
    ``P(None, "model")`` (bias ``P("model")``) — each device owns
    ``num_heads / tp`` attention heads end to end.
  - attention output projections (``*_out``): row-sharded
    ``P("model", None)`` — the partial products all-reduce over ICI back to
    replicated activations at the residual boundary.
  - MLP fc1 column- / fc2 row-sharded (hidden dim split ``mlp_ratio * d / tp``
    per device).
  - classifier heads: first layer column-, second row-sharded, deeper layers
    replicated.
  - input projections, layernorms, and everything scalar stay replicated.

The same name rules cover the optimizer state: AdamW's ``mu``/``nu`` mirror
the params tree, so their leaves carry the param path as a suffix and pick
up the same spec. Activations between blocks are replicated; the batch dim
shards over "data", so TP composes with DP on a (data, model) mesh.

TP mode requires the jnp attention/MLP paths (ModelConfig.tensor_parallel
gates the Pallas kernels off): GSPMD cannot partition a pallas_call, and the
jnp einsums partition cleanly along the head axis.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmd_tpu.core.mesh import MODEL_AXIS

# Param-name suffixes (leaf's parent dict key) -> split kind.
_COL = "col"    # weight (in, out) -> P(None, model); bias (out,) -> P(model)
_ROW = "row"    # weight (in, out) -> P(model, None); bias replicated

_COL_NAMES = frozenset({
    "text_WQ", "text_WK", "text_WV", "image_WQ", "image_WK", "image_WV",
    "text_evidence_key", "text_evidence_value",
    "image_evidence_key", "image_evidence_value",
})


def _split_kind(path) -> str | None:
    """Classify a leaf by the param names along its tree path.

    Works on any tree that embeds the fusion-param paths (params itself,
    or AdamW mu/nu inside the optimizer state)."""
    names = [p.key for p in path if hasattr(p, "key")]
    in_mlp = any(n in ("text_mlp", "image_mlp") for n in names)
    in_classifier = "classifier" in names
    for n in reversed(names):
        if n in _COL_NAMES:
            return _COL
        if n.endswith("_out"):
            return _ROW
        if in_mlp and n == "fc1":
            return _COL
        if in_mlp and n == "fc2":
            return _ROW
        if in_classifier and n == "fc0":
            return _COL
        if in_classifier and n == "fc1":
            return _ROW
    return None


# Encoder layer names (models/transformer.py::init_layer — shared by the
# BERT/MPNet/ViT/captioner stacks — and models/deberta.py::init_deberta):
# q/k/v and ffn_in split by column (heads / hidden), every *_out projection
# (attn_out, xattn_out, ffn_out) by row. Embeddings, LNs, pos tables, and
# pooler stay replicated (default P()).
_ENC_COL = frozenset({"q", "k", "v", "xq", "xk", "xv", "ffn_in"})


def _enc_split_kind(path) -> str | None:
    names = [p.key for p in path if hasattr(p, "key")]
    for n in reversed(names):
        if n in _ENC_COL:
            return _COL
        if n.endswith("_out"):
            return _ROW
    return None


def _kind_spec(kind: str | None, leaf) -> P:
    ndim = getattr(leaf, "ndim", 0)
    if kind == _COL:
        if ndim == 2:
            return P(None, MODEL_AXIS)
        if ndim == 1:
            return P(MODEL_AXIS)
    elif kind == _ROW:
        if ndim == 2:
            return P(MODEL_AXIS, None)
        # row-split bias is added after the all-reduce: replicated
    return P()


def state_specs(tree: Any) -> Any:
    """PartitionSpec pytree for any fusion-param-bearing tree (params, a
    TrainState, or an optax state)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _kind_spec(_split_kind(path), leaf), tree)


def encoder_specs(tree: Any) -> Any:
    """PartitionSpec pytree for an encoder param tree (DeBERTa, BERT/MPNet,
    ViT, captioner — anything built on transformer.py layer names)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _kind_spec(_enc_split_kind(path), leaf), tree)


def _put(tree: Any, specs: Any, mesh: Mesh) -> Any:
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(tree, shardings)


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put `tree` with TP shardings derived from its param paths."""
    return _put(tree, state_specs(tree), mesh)


def shard_encoder(params: Any, mesh: Mesh) -> Any:
    """device_put encoder params with the encoder TP shardings. The jnp
    attention paths are required (pass fused/fused_attn=False on TPU —
    GSPMD cannot partition a pallas_call)."""
    return _put(params, encoder_specs(params), mesh)


def zero1_specs(state: Any, data_size: int) -> Any:
    """ZeRO-1: PartitionSpecs for a TrainState that shard the OPTIMIZER
    state (AdamW mu/nu) over the DATA axis while params stay replicated —
    each DP rank holds 1/n of the moments (2/3 of the training-state
    memory beyond params), and GSPMD gathers the param update over ICI.
    Leaves whose leading dim does not divide by the axis stay replicated
    (classifier-logit biases and scalars like Adam's count)."""
    from mmd_tpu.core.mesh import DATA_AXIS

    def opt_spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] % data_size == 0 and shape[0] > 0:
            return P(DATA_AXIS, *([None] * (len(shape) - 1)))
        return P()

    repl = jax.tree_util.tree_map(lambda _: P(), state.params)
    opt = jax.tree_util.tree_map(opt_spec, state.opt_state)
    return state._replace(step=P(), params=repl, opt_state=opt, rng=P())


def tp_zero1_specs(state: Any, data_size: int) -> Any:
    """TP + ZeRO-1 composed: params carry the Megatron TP specs
    (state_specs); the AdamW moments keep their TP axis AND additionally
    shard their first TP-free dim over "data" when it divides — e.g. the
    moment of a column-sharded (d, d/tp) weight lives P("data", "model"),
    1/(dp*tp) per device. Scalars/odd dims stay as their TP spec."""
    from mmd_tpu.core.mesh import DATA_AXIS

    full = state_specs(state)

    def opt_spec(path, leaf):
        base = _kind_spec(_split_kind(path), leaf)
        shape = getattr(leaf, "shape", ())
        if not shape:
            return base
        dims = list(base) + [None] * (len(shape) - len(base))
        for i, d in enumerate(dims):
            if d is None and shape[i] % data_size == 0 and shape[i] > 0:
                dims[i] = DATA_AXIS
                break
        return P(*dims)

    opt = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    return state._replace(step=P(), params=full.params, opt_state=opt,
                          rng=P())


def zero3_specs(state: Any, data_size: int) -> Any:
    """ZeRO-3 / FSDP: PartitionSpecs that shard the PARAMS over the DATA
    axis as well as the AdamW moments — each DP rank physically holds 1/n
    of every weight. GSPMD inserts the all-gather where the forward/
    backward consumes a full weight (and reduce-scatters the grads into
    the sharded update), which is exactly the FSDP schedule expressed as
    sharding annotations instead of hand-written collectives. Per-rank
    training-state memory drops to ~1/n of params+moments; the cost is
    one weight all-gather per use, riding ICI.

    Leaves whose leading dim does not divide by the axis (tiny biases,
    Adam's count scalar) stay replicated — they are bytes, not memory."""
    from mmd_tpu.core.mesh import DATA_AXIS

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] % data_size == 0 and shape[0] > 0:
            return P(DATA_AXIS, *([None] * (len(shape) - 1)))
        return P()

    params = jax.tree_util.tree_map(spec, state.params)
    opt = jax.tree_util.tree_map(spec, state.opt_state)
    return state._replace(step=P(), params=params, opt_state=opt, rng=P())


def validate_tp_config(mcfg, mesh: Mesh) -> None:
    tp = mesh.shape[MODEL_AXIS]
    if mcfg.num_heads % tp != 0:
        raise ValueError(
            f"num_heads={mcfg.num_heads} must divide by model axis {tp}")
    hidden = int(mcfg.embed_dim * mcfg.mlp_ratio)
    if (mcfg.embed_dim % tp != 0 or hidden % tp != 0
            or mcfg.hidden_dim % tp != 0):
        raise ValueError(
            f"embed_dim={mcfg.embed_dim}/hidden={hidden}/"
            f"head hidden={mcfg.hidden_dim} not divisible by model axis {tp}")
