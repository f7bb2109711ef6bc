"""Device mesh + declarative sharding of quantized params and KV cache.

This layer has NO reference counterpart: ExLlama's only multi-device story
is per-layer placement with host-mediated copies (reference
model.py:636-668, 702-708, 1053-1058). The TPU-native design shards tensors
over a 2-axis mesh and runs the forward pass inside ``shard_map`` so the
Pallas kernel stack executes per-shard (models/llama.forward_chunk):

  * ``tp`` (tensor parallel, rides ICI): q/k/v/gate/up shard their *output*
    columns; o/down shard their *input* rows (Megatron-style pairing, so the
    only collectives per block are one psum after o and one after down).
    Packed weights are re-tiled at load into tp independently padded
    column/row segments (formats/gptq.retile_out_for_tp / retile_in_for_tp)
    so every shard holds a self-contained npair layout — head-aligned for
    q/k/v (attention runs on local heads over the head-sharded KV cache),
    row-step-aligned for gate/up/down so the MLP's K split stays
    kernel-legal at any intermediate size.
  * ``dp`` (data/batch parallel, can span DCN): batch dimension of
    activations and KV cache.
  * KV cache shards over kv-heads on ``tp`` and batch on ``dp``.

Weight-stationary: after load + device_put with these shardings, weights
never move; activations flow through the psum boundaries shard_map places.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exllama_tpu.formats.gptq import (
    N_ALIGN,
    QuantTensor,
    fuse_quant_tensors_tp,
    retile_in_for_tp,
    retile_out_for_tp,
)

# Row-alignment step for row-parallel (K-side) shards: local K must keep the
# x-tile lane dim 128-aligned for the q4 kernels (ops/quant block choosers).
TP_ROW_STEP = 128


def make_mesh(
    tp: int = 1,
    dp: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= tp * dp, (
        f"need {tp * dp} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def mesh_axis_sizes(mesh) -> "tuple[int, int]":
    """(dp, tp) axis sizes of a mesh (1 for absent axes)."""
    if mesh is None:
        return 1, 1
    d = dict(zip(mesh.axis_names, mesh.devices.shape))
    return d.get("dp", 1), d.get("tp", 1)


# ---------------------------------------------------------------------------
# TP retiling of a whole model (host-side, before device placement)
# ---------------------------------------------------------------------------

def _row_step(qt: QuantTensor) -> int:
    return math.lcm(TP_ROW_STEP, qt.groupsize)


def prepare_params_tp(params, tp: int, fuse: bool = False):
    """Re-tile every layer's quantized tensors for ``tp``-way Megatron
    sharding (see module doc). Must run BEFORE w8 attachment and device
    placement. With ``fuse`` set, q/k/v and gate/up additionally fuse into
    per-shard-interleaved qkv/gateup tensors (skipped for act-order layers,
    whose per-tensor x_maps cannot share one activation permutation)."""
    from exllama_tpu.models.llama import LayerParams

    if tp == 1:
        return params

    def prep_layer(lp: LayerParams) -> LayerParams:
        assert lp.qkv is None and lp.gateup is None, (
            "prepare_params_tp expects unfused projections (the loader "
            "fuses AFTER retiling under tp>1)"
        )
        if lp.down.x_map is not None:
            raise ValueError(
                "act-order down_proj under tensor parallelism requires the "
                "load-time fold (tuning.fold_act_order=True): its x_map "
                "crosses K-shard boundaries"
            )
        # gate/up column chunks and down's K chunks must coincide (the
        # per-shard silu(gate)·up activation feeds down's local rows
        # directly), so compute ONE chunk for the MLP triple — group- and
        # lane-aligned even when intermediate/tp is not (65B: 22016/8).
        from exllama_tpu.formats.gptq import tp_chunk

        c_mlp = tp_chunk(
            lp.down.in_features, tp, _row_step(lp.down)
        )
        # o's K rows must line up with the attention output (local heads,
        # contiguous), so its chunk is exactly qdim/tp — group-aligned for
        # every real groupsize (gs | 128 | head_dim).
        c_o = lp.o.in_features // tp
        if c_o % lp.o.groupsize:
            raise ValueError(
                f"o_proj K split {c_o} not aligned to groupsize "
                f"{lp.o.groupsize} under tp={tp}"
            )
        new = dataclasses.replace(
            lp,
            q=retile_out_for_tp(lp.q, tp),
            k=retile_out_for_tp(lp.k, tp),
            v=retile_out_for_tp(lp.v, tp),
            o=retile_in_for_tp(lp.o, tp, chunk=c_o),
            gate=retile_out_for_tp(lp.gate, tp, chunk=c_mlp),
            up=retile_out_for_tp(lp.up, tp, chunk=c_mlp),
            down=retile_in_for_tp(lp.down, tp, chunk=c_mlp),
        )
        if fuse and all(
            t.x_map is None for t in (lp.q, lp.k, lp.v, lp.gate, lp.up)
        ):
            new = dataclasses.replace(
                new,
                q=None, k=None, v=None, gate=None, up=None,
                qkv=fuse_quant_tensors_tp([new.q, new.k, new.v], tp),
                gateup=fuse_quant_tensors_tp([new.gate, new.up], tp),
            )
        return new

    return dataclasses.replace(
        params, layers=tuple(prep_layer(lp) for lp in params.layers)
    )


def validate_tp(config, tp: int) -> None:
    """Shape divisibility a tp-way mesh requires (heads drive attention and
    the KV cache's head sharding; K splits must keep groups whole)."""
    if tp == 1:
        return
    c = config
    problems = []
    if c.num_attention_heads % tp:
        problems.append(f"num_attention_heads {c.num_attention_heads} % tp")
    if c.num_key_value_heads % tp:
        problems.append(f"num_key_value_heads {c.num_key_value_heads} % tp")
    if c.head_dim % 128:
        problems.append(f"head_dim {c.head_dim} not lane-aligned")
    if problems:
        raise ValueError(f"config not tp={tp}-shardable: {problems}")


# ---------------------------------------------------------------------------
# PartitionSpecs (shared by device placement and shard_map in_specs)
# ---------------------------------------------------------------------------

def _quant_specs(qt: QuantTensor, shard: str) -> QuantTensor:
    """PartitionSpecs for one QuantTensor. ``shard`` ∈ {'out', 'in', 'none'}.

    'out' shards output columns (retiled segments): qweight/scales column
    axes, plus the w8 image's columns. 'in' shards input rows: qweight's K
    axis, scales' group axis, x_map's entries, w8's rows.
    """
    if shard == "out":
        qw = P(None, "tp")
        sc = P(None, "tp")
        xm = P(None)                     # K-side permutation: replicated
        w8 = P(None, "tp")
        w8s = P(None, "tp")
    elif shard == "in":
        qw = P("tp", None)
        sc = P("tp", None)
        xm = P("tp")                     # rows travel with their K shard
        w8 = P("tp", None)
        w8s = P(None, None)
    else:
        qw = P(None, None)
        sc = P(None, None)
        xm = P(None)
        w8 = P(None, None)
        w8s = P(None, None)
    return QuantTensor(
        qweight=qw,
        scales=sc,
        zscale=sc,
        x_map=None if qt.x_map is None else xm,
        w8=None if qt.w8 is None else w8,
        w8_scale=None if qt.w8_scale is None else w8s,
        in_features=qt.in_features,
        out_features=qt.out_features,
        groupsize=qt.groupsize,
        layout=qt.layout,
        tp_segments=qt.tp_segments,
    )


def param_pspecs(params, tp: int):
    """ModelParams-shaped pytree of PartitionSpecs (layers = per-layer
    tuple). Under tp>1 the quantized tensors must be retiled
    (prepare_params_tp); embed / norms / rope / lm_head replicate (the head
    runs redundantly per shard — its GEMV is a small slice of the decode
    budget and replicating it keeps argmax/sampling local)."""
    from exllama_tpu.models.llama import LayerParams, ModelParams

    def spec_for(qt, want: str):
        if qt is None:
            return None
        if tp > 1 and qt.tp_segments != tp and want in ("out", "in"):
            raise ValueError(
                f"tensor not retiled for tp={tp} (tp_segments="
                f"{qt.tp_segments}); run prepare_params_tp/shard_params"
            )
        return _quant_specs(qt, want if tp > 1 else "none")

    layer_specs = tuple(
        LayerParams(
            input_norm=P(None),
            post_norm=P(None),
            q=spec_for(lp.q, "out"),
            k=spec_for(lp.k, "out"),
            v=spec_for(lp.v, "out"),
            o=spec_for(lp.o, "in"),
            gate=spec_for(lp.gate, "out"),
            up=spec_for(lp.up, "out"),
            down=spec_for(lp.down, "in"),
            qkv=spec_for(lp.qkv, "out"),
            gateup=spec_for(lp.gateup, "out"),
        )
        for lp in params.layers
    )
    head = params.lm_head
    head_spec = (
        _quant_specs(head, "none")
        if isinstance(head, QuantTensor)
        else P(None, None)
    )
    return ModelParams(
        embed=P(None, None),
        layers=layer_specs,
        norm=P(None),
        lm_head=head_spec,
        rope_sin=P(None, None),
        rope_cos=P(None, None),
    )


def param_shardings(params, mesh: Mesh):
    """ModelParams-shaped pytree of NamedShardings."""
    _, tp = mesh_axis_sizes(mesh)
    specs = param_pspecs(params, tp)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, mesh: Mesh, fuse: bool = False):
    """Retile (tp>1) + place a ModelParams pytree onto the mesh.

    ``fuse``: fuse q/k/v and gate/up per shard after retiling (the TP
    equivalent of tuning.fuse_projections; ignored at tp=1, where the
    loader fuses globally)."""
    if mesh is None:
        return params
    _, tp = mesh_axis_sizes(mesh)
    if tp > 1 and any(
        lp.qkv is not None or lp.gateup is not None for lp in params.layers
    ):
        raise ValueError(
            "TP sharding requires unfused input params: load with "
            "tuning.fuse_projections=False or let the loader handle fusion "
            "(it retiles first, then fuses per shard)"
        )
    if tp > 1:
        params = prepare_params_tp(params, tp, fuse=fuse)
    return jax.device_put(params, param_shardings(params, mesh))


def cache_sharding(mesh: Mesh) -> NamedSharding:
    """Per-layer [B, Hkv, S, D] — batch over dp, kv-heads over tp."""
    return NamedSharding(mesh, P("dp", "tp", None, None))


def shard_cache(cache, mesh: Mesh):
    from exllama_tpu.cache import KVCacheState

    sh = cache_sharding(mesh)
    sh3 = NamedSharding(mesh, P("dp", "tp", None))  # int8-cache scale strips

    def put(t, s):
        return None if t is None else tuple(jax.device_put(x, s) for x in t)

    cache.state = KVCacheState(
        k=put(cache.state.k, sh),
        v=put(cache.state.v, sh),
        k_scale=put(cache.state.k_scale, sh3),
        v_scale=put(cache.state.v_scale, sh3),
    )
    return cache
