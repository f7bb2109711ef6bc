"""Preallocated KV cache as an explicit, functional pytree.

Re-design of the reference's ``ExLlamaCache`` (model.py:557-631): per-layer
fp16 tensors with a single position cursor. Differences, all TPU-motivated:

  * Each layer's cache is its own [B, Hkv, S_max, D] array (a tuple over
    layers). Keeping layers as separate buffers lets the unrolled forward
    pass feed each Pallas kernel its own operand with no per-layer
    slice-materialization: a stacked [L, ...] array + lax.scan forced XLA to
    copy every layer's 33 MB KV slice (and 100 MB weight slice) in and out
    per token — measured 3x the whole decode budget on v5e.
  * Layout is head-major [B, Hkv, S_max, D] (like the reference): each kv
    head's sequence strip is contiguous, so the flash-attention kernel's
    per-head KV blocks are unit-stride DMAs.
  * dtype is bfloat16 (TPU-native) instead of fp16.
  * All mutation is functional; under jit with donated buffers XLA updates
    in place. ``current_seq_len`` lives on the host (the generator owns the
    cursor, as in the reference where generators mutate it directly,
    generator.py:217/259/699) and is passed into jitted steps as a device
    scalar.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCacheState:
    """Device half of the cache: per-layer KV arrays.

    ``k`` and ``v`` are tuples (length L) of [B, Hkv, S_max, D] arrays.
    For int8 caches (TuningParams.kv_cache_dtype == "int8", a TPU-native
    option with no reference counterpart — the reference is fp16-only,
    model.py:576-577) ``k_scale``/``v_scale`` hold per-layer [B, Hkv, S_max]
    f32 per-token-per-head quantization scales; otherwise they are None.
    The sequence axis is axis 2 in every array, so cache ops (roll, slot
    install, beam gathers) transform all four tuples uniformly.
    """

    k: tuple
    v: tuple
    k_scale: "tuple | None" = None
    v_scale: "tuple | None" = None


def _map_tuple(fn, t):
    return None if t is None else tuple(fn(x) for x in t)


def _map_state(fn, state: KVCacheState) -> KVCacheState:
    """Apply ``fn`` to every per-layer array (KV and scales). ``fn`` must be
    rank-agnostic over the trailing dims (axes 0..2 are B, Hkv, S for all)."""
    return KVCacheState(
        k=tuple(fn(x) for x in state.k),
        v=tuple(fn(x) for x in state.v),
        k_scale=_map_tuple(fn, state.k_scale),
        v_scale=_map_tuple(fn, state.v_scale),
    )


class ExLlamaCache:
    """Host-side cache handle: device arrays + position cursor + ops.

    Mirrors the reference API surface (zero/clone/roll_left/copy_states,
    model.py:588-631) with functional device updates.
    """

    def __init__(
        self,
        model=None,
        *,
        batch_size: int = 1,
        max_seq_len: int | None = None,
        copy_from: "ExLlamaCache | None" = None,
        shape: tuple[int, int, int, int, int] | None = None,
        dtype=None,
    ):
        if copy_from is not None:
            self.batch_size = copy_from.batch_size
            self.max_seq_len = copy_from.max_seq_len
            self.shape = copy_from.shape
            self.dtype = copy_from.dtype
            st = copy_from.state
            self.state = KVCacheState(
                tuple(st.k), tuple(st.v),
                k_scale=None if st.k_scale is None else tuple(st.k_scale),
                v_scale=None if st.v_scale is None else tuple(st.v_scale),
            )
            self.current_seq_len = copy_from.current_seq_len
            return

        if model is not None:
            cfg = model.config
            batch_size = batch_size or cfg.batch_size
            max_seq_len = max_seq_len or cfg.max_seq_len
            shape = (
                cfg.num_hidden_layers,
                batch_size,
                max_seq_len,
                cfg.num_key_value_heads,
                cfg.head_dim,
            )
            if dtype is None and cfg.tuning.kv_cache_dtype == "int8":
                dtype = jnp.int8
            if dtype is None and cfg.tuning.kv_cache_dtype == "int4":
                dtype = "int4"
        if dtype is None:
            dtype = jnp.bfloat16
        assert shape is not None, "need model=, copy_from= or shape="
        # "int4": packed two-per-byte along D (int8 container, D/2 wide;
        # ops/attention.quantize_kv_rows4)
        int4 = dtype == "int4"
        if int4:
            dtype = jnp.int8
        self.batch_size = shape[1]
        self.max_seq_len = shape[2]
        self.shape = shape
        self.dtype = dtype
        d_store = shape[4] // 2 if int4 else shape[4]
        if (
            model is not None
            and model.config.tuning.pad_head_dim
            and not int4
        ):
            from exllama_tpu.ops.attention import flash_supported_head_dim

            d = shape[4]
            if not flash_supported_head_dim(d):
                d_store = 64 if d <= 64 else -(-d // 128) * 128
        layer_shape = (shape[1], shape[3], shape[2], d_store)   # B,Hkv,S,D*
        scale_shape = layer_shape[:3]                           # B,Hkv,S
        quantized = jnp.dtype(dtype) == jnp.int8
        self.state = KVCacheState(
            k=tuple(jnp.zeros(layer_shape, dtype) for _ in range(shape[0])),
            v=tuple(jnp.zeros(layer_shape, dtype) for _ in range(shape[0])),
            k_scale=(
                tuple(
                    jnp.zeros(scale_shape, jnp.float32)
                    for _ in range(shape[0])
                )
                if quantized
                else None
            ),
            v_scale=(
                tuple(
                    jnp.zeros(scale_shape, jnp.float32)
                    for _ in range(shape[0])
                )
                if quantized
                else None
            ),
        )
        self.current_seq_len = 0

    # -- reference-parity ops (model.py:588-631) ---------------------------

    def zero(self):
        self.state = _map_state(jnp.zeros_like, self.state)
        self.current_seq_len = 0

    def clone(self) -> "ExLlamaCache":
        return ExLlamaCache(copy_from=self)

    def roll_left(self):
        """Drop position 0, shift everything left by one (beam bookkeeping,
        reference model.py:601-608)."""
        self.state = _map_state(
            lambda x: jnp.roll(x, -1, axis=2), self.state
        )
        self.current_seq_len -= 1

    def copy_states(
        self,
        target: "ExLlamaCache",
        from_column: int,
        from_columns: int,
        to_column: int,
        to_columns: int,
        from_row: int = 0,
        from_rows: int = 1,
        to_row: int = 0,
        to_rows: int = 1,
    ):
        """Rectangle copy between caches (reference model.py:611-631):
        copy ``from_columns`` cache positions starting at ``from_column`` of
        batch row ``from_row`` into ``target`` at ``to_column``/``to_row``,
        broadcasting over rows when from_rows == 1 < to_rows."""
        assert from_columns == to_columns or from_columns == 1
        hkv = self.shape[3]

        def copy_layer(src, dst):
            # rank-generic: KV arrays are [B, Hkv, S, D], scale arrays
            # [B, Hkv, S]; axes 0..2 are handled identically.
            sizes = (from_rows, hkv, from_columns) + src.shape[3:]
            starts = (from_row, 0, from_column) + (0,) * (src.ndim - 3)
            s = jax.lax.dynamic_slice(src, starts, sizes)
            if from_rows == 1 and to_rows > 1:
                s = jnp.broadcast_to(s, (to_rows,) + s.shape[1:])
            if from_columns == 1 and to_columns > 1:
                s = jnp.broadcast_to(
                    s, s.shape[:2] + (to_columns,) + s.shape[3:]
                )
            dst_starts = (to_row, 0, to_column) + (0,) * (src.ndim - 3)
            return jax.lax.dynamic_update_slice(
                dst, s.astype(dst.dtype), dst_starts
            )

        def copy_tuple(srcs, dsts):
            if srcs is None:
                return None
            return tuple(copy_layer(s, t) for s, t in zip(srcs, dsts))

        target.state = KVCacheState(
            k=copy_tuple(self.state.k, target.state.k),
            v=copy_tuple(self.state.v, target.state.v),
            k_scale=copy_tuple(self.state.k_scale, target.state.k_scale),
            v_scale=copy_tuple(self.state.v_scale, target.state.v_scale),
        )
