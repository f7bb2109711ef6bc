"""GPTQ tensor format: unpack, act-order repack, and the TPU panel layout.

GPTQ checkpoints store, per linear layer (reference model.py:141-145):

  * ``qweight``  int32 [K/8,  N]   — 8 4-bit weights per word packed along K
                                     (rows): bits 4*i of qweight[r, n] hold
                                     the quantized value of W[r*8+i, n].
  * ``qzeros``   int32 [K/gs, N/8] — 8 4-bit zero-points per word packed
                                     along N (columns); the *stored* value is
                                     zero-1 so dequantization is
                                     ``(q - (z+1)) * s`` (reference
                                     q4_matrix.cu:199, matrix.cuh:95,143).
  * ``scales``   fp16  [K/gs, N]
  * ``g_idx``    int32 [K]         — only for act-order models: the
                                     quantization group of each row, in
                                     activation-importance order.

The reference keeps this layout and unpacks nibbles inside its CUDA kernel
(matrix.cuh:87-133). On TPU we repack once at load time into a layout whose
in-kernel unpack is two int8 mask ops per byte:

TPU *kgroup* layout
-------------------
``qweight_tpu`` int32 [K/8, N_pad] — K-packed like the GPTQ wire format
(lanes = output columns, zero-padded to a multiple of N_ALIGN = 256), but
with the 8 nibbles of each word arranged so that Mosaic's int32→int8
bitcast (int8 row r' = 4r + j, little-endian bytes) unpacks each
quantization group into its two contiguous halves:

  * the LOW nibble of int8 row r' (group g, r' ∈ [g·gs/2, (g+1)·gs/2))
    holds logical k-row  g·gs + (r' − g·gs/2)          — first half of g
  * the HIGH nibble holds logical k-row g·gs + gs/2 + (r' − g·gs/2)
    — second half — stored with its top bit flipped (value XOR 8), so the
    signed int8 ``byte & 0xF0`` equals exactly ``16·q − 128``: the kernel
    recovers the true value with per-GROUP affine math instead of a
    per-weight shift (Mosaic has no int8 arithmetic shift).

In-kernel unpack is then: bitcast → ``b & 0x0F`` (first-half tile) and
``b & 0xF0`` (second-half tile, affine-encoded) — two VPU ops per byte of
packed weights, plus the int8→bf16 converts feeding the MXU. Padded columns
carry scale = zscale = 0 and dequantize to exactly 0.

Act-order is resolved at load time by sorting rows group-sequential and
remembering the row permutation ``x_map`` to apply to the activation — the
reference's ``make_sequential``/``x_map`` trick (q4_matrix.cu:104-168), which
beats per-element g_idx gathers on any hardware.

Everything in this module is host-side numpy; the outputs are ordinary
arrays that become leaves of the model's parameter pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

LANE = 128
N_ALIGN = 1024    # output-column padding granularity of the kgroup layout
                  # (1024 keeps wide-matrix N blocks large: 11008 -> 11264
                  # gives bn=1024 blocks; 256-alignment left 11008 with only
                  # 256-wide lane-legal blocks and cost ~12% decode)
PANEL = 8 * LANE  # retained for the legacy panel-layout helpers below


# ---------------------------------------------------------------------------
# GPTQ wire-format pack/unpack (host, numpy)
# ---------------------------------------------------------------------------

def unpack_gptq_qweight(qweight: np.ndarray) -> np.ndarray:
    """int32 [K/8, N] → uint8 [K, N] of 4-bit values (row-packed)."""
    assert qweight.dtype == np.int32 and qweight.ndim == 2
    kw, n = qweight.shape
    w = qweight.astype(np.uint32)
    out = np.empty((kw, 8, n), dtype=np.uint8)
    for i in range(8):
        out[:, i, :] = (w >> (4 * i)) & 0xF
    return out.reshape(kw * 8, n)


def pack_gptq_qweight(q: np.ndarray) -> np.ndarray:
    """uint8 [K, N] of 4-bit values → int32 [K/8, N] (row-packed)."""
    k, n = q.shape
    assert k % 8 == 0
    q = q.reshape(k // 8, 8, n).astype(np.uint32)
    out = np.zeros((k // 8, n), dtype=np.uint32)
    for i in range(8):
        out |= (q[:, i, :] & 0xF) << (4 * i)
    return out.astype(np.int32)


def unpack_gptq_qzeros(qzeros: np.ndarray) -> np.ndarray:
    """int32 [G, N/8] → uint8 [G, N] of stored zero-points (column-packed)."""
    assert qzeros.dtype == np.int32 and qzeros.ndim == 2
    g, nw = qzeros.shape
    z = qzeros.astype(np.uint32)
    out = np.empty((g, nw, 8), dtype=np.uint8)
    for i in range(8):
        out[:, :, i] = (z >> (4 * i)) & 0xF
    return out.reshape(g, nw * 8)


def pack_gptq_qzeros(z: np.ndarray) -> np.ndarray:
    """uint8 [G, N] → int32 [G, N/8] (column-packed)."""
    g, n = z.shape
    assert n % 8 == 0
    z = z.reshape(g, n // 8, 8).astype(np.uint32)
    out = np.zeros((g, n // 8), dtype=np.uint32)
    for i in range(8):
        out |= (z[:, :, i] & 0xF) << (4 * i)
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# Act-order → sequential rows + activation permutation
# ---------------------------------------------------------------------------

def make_sequential(
    q: np.ndarray, g_idx: np.ndarray, groupsize: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reorder rows of the unpacked weight so groups are sequential.

    Returns (q_sequential, x_map) where ``q_sequential[i] = q[x_map[i]]`` and
    row ``i`` of the sequential weight belongs to group ``i // groupsize``.
    The activation must be permuted the same way: ``x_seq = x[..., x_map]``;
    then ``x_seq @ W_seq == x @ W``. Mirrors reference q4_matrix.cu:104-168.
    """
    k = q.shape[0]
    assert g_idx.shape == (k,)
    counts = np.bincount(g_idx, minlength=(k + groupsize - 1) // groupsize)
    if not np.all(counts[: k // groupsize] == groupsize):
        raise ValueError("g_idx does not assign exactly groupsize rows/group")
    x_map = np.argsort(g_idx, kind="stable").astype(np.int32)
    return q[x_map], x_map


# ---------------------------------------------------------------------------
# TPU npair layout (the shipping layout)
# ---------------------------------------------------------------------------
#
# ``qweight_npair`` int32 [K/4, N_pad/2]: each byte holds TWO OUTPUT COLUMNS
# of the same logical K row — within every N_ALIGN (1024) column block, byte
# column c pairs original columns (c, c + 512): the LOW nibble is column c's
# value (exact) and the HIGH nibble is column c+512's value stored top-bit
# flipped, so the SIGNED byte equals 16·q_hi − 128 + q_lo. The kernel then
# needs only THREE VPU ops per byte (one full-byte int8→bf16 convert, one
# ``& 0xF0`` mask, one masked convert) to get two exact dot products:
#
#   d1 = x·byte = 16·H − 128·Σx + L      d2 = x·(byte & 0xF0) = 16·H − 128·Σx
#   ⇒  L = d1 − d2        H = d2/16 + 8·Σx
#
# (L/H = the raw low/high column sums) — 25% less unpack work than the
# earlier kgroup layout's two masks + two converts, with bit-identical
# results. Byte rows are plain K rows (int8 row r = logical row r after the
# act-order permutation; int32 word r/4, byte r%4, little endian), so the
# quantization-group structure is just contiguous row ranges.

PAIR_HALF = N_ALIGN // 2   # column-pair stride inside an aligned block


def pack_npair(q: np.ndarray) -> np.ndarray:
    """uint8 [K, N] 4-bit values → int32 [K/4, N_pad/2] npair layout."""
    k, n = q.shape
    assert k % 4 == 0
    n_pad = -(-n // N_ALIGN) * N_ALIGN
    if n_pad != n:
        q = np.concatenate(
            [q, np.zeros((k, n_pad - n), dtype=q.dtype)], axis=1
        )
    qb = q.reshape(k, n_pad // N_ALIGN, 2, PAIR_HALF)
    lo = qb[:, :, 0, :]
    hi = qb[:, :, 1, :] ^ 8            # top bit flipped (see above)
    bts = (lo | (hi << 4)).astype(np.uint8).reshape(k, n_pad // 2)
    words = (
        bts[0::4].astype(np.uint32)
        | (bts[1::4].astype(np.uint32) << 8)
        | (bts[2::4].astype(np.uint32) << 16)
        | (bts[3::4].astype(np.uint32) << 24)
    )
    return words.astype(np.int32)      # [K/4, N_pad/2]


def unpack_npair(words: np.ndarray, n: Optional[int] = None) -> np.ndarray:
    """Inverse of :func:`pack_npair`: int32 [K/4, N_pad/2] → uint8 [K, N]."""
    kw, npk = words.shape
    k = kw * 4
    n_pad = npk * 2
    w = words.astype(np.uint32)
    bts = np.empty((k, npk), np.uint8)
    for j in range(4):
        bts[j::4] = (w >> (8 * j)) & 0xFF
    nb = n_pad // N_ALIGN
    lo = (bts & 0x0F).reshape(k, nb, PAIR_HALF)
    hi = (((bts >> 4) & 0x0F) ^ 8).reshape(k, nb, PAIR_HALF)
    q = np.stack([lo, hi], axis=2).reshape(k, n_pad)
    return q[:, :n] if n is not None else q


# ---------------------------------------------------------------------------
# TPU kgroup layout (legacy; superseded by npair, kept for format tests)
# ---------------------------------------------------------------------------

def pack_kgroup(q: np.ndarray, groupsize: int) -> np.ndarray:
    """uint8 [K, N] 4-bit values → int32 [K/8, N_pad] kgroup layout."""
    k, n = q.shape
    assert k % groupsize == 0 and groupsize % 2 == 0
    n_pad = -(-n // N_ALIGN) * N_ALIGN
    if n_pad != n:
        q = np.concatenate(
            [q, np.zeros((k, n_pad - n), dtype=q.dtype)], axis=1
        )
    half = groupsize // 2
    qg = q.reshape(k // groupsize, groupsize, n_pad)
    lo = qg[:, :half, :]
    hi = qg[:, half:, :] ^ 8           # top bit flipped (see module doc)
    bts = (lo | (hi << 4)).astype(np.uint8).reshape(k // 2, n_pad)
    bts[:, n:] = 0                     # padded columns all-zero bytes
    words = (
        bts[0::4].astype(np.uint32)
        | (bts[1::4].astype(np.uint32) << 8)
        | (bts[2::4].astype(np.uint32) << 16)
        | (bts[3::4].astype(np.uint32) << 24)
    )
    return words.astype(np.int32)      # [K/8, N_pad]


def unpack_kgroup(
    words: np.ndarray, groupsize: int, n: Optional[int] = None
) -> np.ndarray:
    """Inverse of :func:`pack_kgroup`: int32 [K/8, N_pad] → uint8 [K, N]."""
    kw, n_pad = words.shape
    k = kw * 8
    w = words.astype(np.uint32)
    bts = np.empty((k // 2, n_pad), np.uint8)
    for j in range(4):
        bts[j::4] = (w >> (8 * j)) & 0xFF
    lo = bts & 0x0F
    hi = ((bts >> 4) & 0x0F) ^ 8
    half = groupsize // 2
    lo = lo.reshape(k // groupsize, half, n_pad)
    hi = hi.reshape(k // groupsize, half, n_pad)
    q = np.concatenate([lo, hi], axis=1).reshape(k, n_pad)
    return q[:, :n] if n is not None else q


# ---------------------------------------------------------------------------
# Legacy TPU panel layout (kept for reference/compat; the kernels use kgroup)
# ---------------------------------------------------------------------------

def repack_panels(q: np.ndarray) -> np.ndarray:
    """uint8 [K, N] 4-bit values → int32 [K, N_pad/8] in panel layout.

    N is zero-padded up to a multiple of PANEL. Within each panel of PANEL
    true columns, nibble i of word column j holds true column i*LANE + j.
    """
    k, n = q.shape
    n_pad = -(-n // PANEL) * PANEL
    if n_pad != n:
        q = np.concatenate(
            [q, np.zeros((k, n_pad - n), dtype=q.dtype)], axis=1
        )
    p = n_pad // PANEL
    # [K, P, 8, LANE]: panel p, nibble i, lane j ← true column p*PANEL+i*LANE+j
    q = q.reshape(k, p, 8, LANE).astype(np.uint32)
    words = np.zeros((k, p, LANE), dtype=np.uint32)
    for i in range(8):
        words |= (q[:, :, i, :] & 0xF) << (4 * i)
    return words.reshape(k, p * LANE).astype(np.int32)


def unpack_panels(qweight_tpu: np.ndarray, n: Optional[int] = None) -> np.ndarray:
    """Inverse of :func:`repack_panels`: int32 [K, N_pad/8] → uint8 [K, N]."""
    k, nw = qweight_tpu.shape
    assert nw % LANE == 0
    p = nw // LANE
    w = qweight_tpu.reshape(k, p, LANE).astype(np.uint32)
    out = np.empty((k, p, 8, LANE), dtype=np.uint8)
    for i in range(8):
        out[:, :, i, :] = (w >> (4 * i)) & 0xF
    out = out.reshape(k, p * PANEL)
    return out[:, :n] if n is not None else out


# ---------------------------------------------------------------------------
# QuantTensor — the on-device representation of one quantized linear layer
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantTensor:
    """A quantized (in_features × out_features) matrix in TPU panel layout.

    Dequantization of true column c, row k (group g = k // groupsize):
        w[k, c] = q[k, c] * scales[g, c] - zscale[g, c]
    where ``zscale = (stored_zero + 1) * scales`` is precomputed at load so
    the kernel does one multiply and one subtract per weight (the reference
    recomputes ``(q - (z+1)) * s`` per element, matrix.cuh:95).

    ``x_map`` (act-order models only) permutes the activation's feature axis
    before the matmul; rows of the stored weight are already group-sequential.
    """

    qweight: jax.Array   # int32: [K/4, N_pad/2] (npair) | [K/8, N_pad] (kgroup)
    scales: jax.Array    # bf16   [K/gs, N_pad] (0 in padded columns)
    zscale: jax.Array    # bf16   [K/gs, N_pad]  = (stored_zero+1)*scales
    x_map: Optional[jax.Array]  # int32 [K] or None

    in_features: int = dataclasses.field(metadata=dict(static=True))
    out_features: int = dataclasses.field(metadata=dict(static=True))
    groupsize: int = dataclasses.field(metadata=dict(static=True))
    layout: str = dataclasses.field(
        default="kgroup", metadata=dict(static=True)
    )
    # Optional load-time int8 re-quantization for turbo prefill: the weights
    # are static, so re-quantizing them per matmul call (the in-kernel deqw8
    # design) wastes VPU time every prefill — with HBM to spare, build the
    # int8 image ONCE and prefill becomes a pure int8 MXU matmul (~2x the
    # bf16 rate on v5e). See formats.gptq.with_w8 / ops.quant._q4_matmul_w8.
    w8: Optional[jax.Array] = None        # int8 [K, N_pad]
    w8_scale: Optional[jax.Array] = None  # f32  [1, N_pad] per-column scale
    # Tensor-parallel retiling (see retile_out_for_tp / retile_in_for_tp):
    # >1 means the stored arrays are laid out as ``tp_segments`` equal,
    # independently padded per-shard segments along the retiled axis. Such
    # a tensor is only meaningful under shard_map with each shard holding
    # one segment (localize_for_tp rewrites the metadata to the local view);
    # calling q4_matmul on the global view is an error.
    tp_segments: int = dataclasses.field(
        default=1, metadata=dict(static=True)
    )

    @property
    def act_order(self) -> bool:
        return self.x_map is not None

    @property
    def padded_out_features(self) -> int:
        if self.layout == "npair":
            return self.qweight.shape[1] * 2
        return self.qweight.shape[1]


def padded_n(n: int) -> int:
    """Padded output width of an N-column tensor in the kgroup layout."""
    return -(-n // N_ALIGN) * N_ALIGN


@jax.jit
def _build_w8(qt: "QuantTensor"):
    import jax.numpy as jnp

    from exllama_tpu.ops.quant import dequantize_xla

    w = dequantize_xla(qt, dtype=jnp.float32)            # [K, N_pad]
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)    # [1, N_pad]
    scale = jnp.maximum(amax, 1e-20) * (1.0 / 127.0)
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale


@jax.jit
def _build_w8_scale(qt: "QuantTensor"):
    import jax.numpy as jnp

    from exllama_tpu.ops.quant import dequantize_xla

    w = dequantize_xla(qt, dtype=jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    return jnp.maximum(amax, 1e-20) * (1.0 / 127.0)


def with_w8_scale(qt: QuantTensor) -> QuantTensor:
    """Attach ONLY the per-column int8 scale (colmax/127, [1, N_pad] f32 —
    4 bytes/column) without the resident image. The in-kernel-requant
    turbo prefill path (ops.quant._q4_prefill_kernel_npair_a8) consumes it
    as a static input instead of re-reducing the dequantized weight per
    call; tensors whose full image fits the HBM budget get with_w8
    instead."""
    if qt.w8_scale is not None:
        return qt
    return dataclasses.replace(qt, w8_scale=_build_w8_scale(qt))


def with_w8(qt: QuantTensor) -> QuantTensor:
    """Attach a load-time int8 re-quantization of the weight (turbo prefill).

    Dequantizes the stored 4-bit weight on device and re-quantizes it to
    per-column symmetric int8 (scale = colmax/127). Prefill then runs ONE
    full-K int8 MXU dot per tile with zero in-kernel dequant work — see
    ops.quant._q4_matmul_w8. Costs K*N_pad bytes of extra HBM (2x the
    packed 4-bit image); callers gate on available memory
    (models.llama._attach_prefill_w8).
    """
    if qt.w8 is not None:
        return qt
    w8, scale = _build_w8(qt)
    return dataclasses.replace(qt, w8=w8, w8_scale=scale)


def concat_quant_tensors(qts: "list[QuantTensor]") -> QuantTensor:
    """Fuse several same-input QuantTensors into one along output columns.

    The projections q/k/v (and gate/up) consume the same activation; packing
    their weights side-by-side turns 3 (2) kernel launches into 1 — the
    TPU-native analogue of the reference's fused q4_attn/q4_mlp megakernels
    (cuda_func/q4_attn.cu:74-204, q4_mlp.cu:100-199), which exist for the
    same reason (amortizing per-launch overhead). Because every part is
    already padded to N_ALIGN, part ``i``'s columns live at
    ``sum(padded_n(n_j) for j < i)`` in the fused output and slicing stays
    static. Requires identical in_features/groupsize and no act-order
    (act-order x_maps differ per tensor, so their activations would need
    different permutations).

    The fused tensor's ``out_features`` is the total padded width so the
    matmul returns all parts (callers slice).
    """
    import jax.numpy as jnp

    first = qts[0]
    for qt in qts:
        assert qt.in_features == first.in_features
        assert qt.groupsize == first.groupsize
        assert qt.layout == first.layout
        assert qt.x_map is None, "cannot fuse act-order tensors"
    return QuantTensor(
        qweight=jnp.concatenate([qt.qweight for qt in qts], axis=1),
        scales=jnp.concatenate([qt.scales for qt in qts], axis=1),
        zscale=jnp.concatenate([qt.zscale for qt in qts], axis=1),
        x_map=None,
        in_features=first.in_features,
        out_features=sum(qt.padded_out_features for qt in qts),
        groupsize=first.groupsize,
        layout=first.layout,
    )


def load_quant_tensor(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray] = None,
    scale_dtype=None,
) -> QuantTensor:
    """Build a :class:`QuantTensor` from GPTQ wire-format tensors.

    Groupsize is inferred from the qweight/qzeros shapes like the reference
    (model.py:165-169). An all-trivial g_idx (sequential groups) is treated
    as absent (reference model.py:147-149).
    """
    if scale_dtype is None:
        # bf16 storage halves the scale/zscale HBM stream (25% of weight
        # bytes at g128 in f32); zscale=(z+1)*s is computed in f32 first so
        # only the final store rounds. Kernels upcast to f32 for the
        # partial-sum math (ops/quant.py).
        import ml_dtypes

        scale_dtype = ml_dtypes.bfloat16
    k = qweight.shape[0] * 8
    n = qweight.shape[1]
    groups = qzeros.shape[0]
    assert k % groups == 0, "qweight rows not divisible by zero-point groups"
    groupsize = k // groups
    assert scales.shape == (groups, n)

    x_map = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx)
        if np.array_equal(g_idx, np.arange(k) // groupsize):
            g_idx = None

    from exllama_tpu import native

    words = None
    if native.available() and scales.dtype == np.float16:
        # C++ fast path: repack directly from the wire format (csrc/)
        if g_idx is not None:
            counts = np.bincount(g_idx, minlength=groups)
            if not np.all(counts == groupsize):
                raise ValueError(
                    "g_idx does not assign exactly groupsize rows/group"
                )
            x_map = native.make_x_map(g_idx, groups)
        words = native.repack_npair(qweight, x_map, k, n)
    if words is not None:
        s, zscale = native.zscale(qzeros, scales, groups, n)
        s = s.astype(scale_dtype, copy=False)
        zscale = zscale.astype(scale_dtype, copy=False)
    else:
        q = unpack_gptq_qweight(qweight)
        if g_idx is not None:
            q, x_map = make_sequential(q, g_idx, groupsize)
        z = unpack_gptq_qzeros(qzeros).astype(np.float32)
        s32 = scales.astype(np.float32)
        zscale = ((z + 1.0) * s32).astype(scale_dtype)  # round once, at store
        s = s32.astype(scale_dtype)
        n_pad = -(-n // N_ALIGN) * N_ALIGN
        if n_pad != n:
            pad = ((0, 0), (0, n_pad - n))
            s = np.pad(s, pad)
            zscale = np.pad(zscale, pad)
        words = pack_npair(q)

    return QuantTensor(
        qweight=words,
        scales=s,
        zscale=zscale,
        x_map=None if x_map is None else np.asarray(x_map, np.int32),
        in_features=k,
        out_features=n,
        groupsize=groupsize,
        layout="npair",
    )


def dequantize(qt: QuantTensor) -> np.ndarray:
    """Host-side full dequantization → f32 [K, N]. Test/validation oracle.

    Note: rows are in *sequential* order; for act-order tensors the caller
    must permute the activation by ``x_map`` (not the output of this).
    """
    if qt.layout == "npair":
        q = unpack_npair(np.asarray(qt.qweight)).astype(np.float32)
    else:
        q = unpack_kgroup(
            np.asarray(qt.qweight), qt.groupsize
        ).astype(np.float32)
    gs = qt.groupsize
    s = np.repeat(np.asarray(qt.scales, dtype=np.float32), gs, axis=0)
    zs = np.repeat(np.asarray(qt.zscale, dtype=np.float32), gs, axis=0)
    w = q * s - zs
    return w[:, : qt.out_features]


# ---------------------------------------------------------------------------
# Synthetic quantization (test fixtures / benchmarks; no reference analogue —
# the reference consumes externally-quantized checkpoints only)
# ---------------------------------------------------------------------------

def quantize_matrix(
    w: np.ndarray,
    groupsize: int = 128,
    act_order: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> dict[str, np.ndarray]:
    """Asymmetric 4-bit min/max quantization of f32 [K, N] → GPTQ tensors.

    Produces the wire format (qweight/qzeros/scales[/g_idx]) so tests and
    benchmarks can fabricate realistic checkpoints. For act_order a random
    row→group assignment is generated (each group exactly groupsize rows).
    """
    k, n = w.shape
    assert k % groupsize == 0 and k % 8 == 0 and n % 8 == 0
    groups = k // groupsize
    rng = rng or np.random.default_rng(0)

    if act_order:
        perm = rng.permutation(k).astype(np.int64)
        g_idx = np.empty(k, dtype=np.int32)
        g_idx[perm] = (np.arange(k) // groupsize).astype(np.int32)
    else:
        g_idx = (np.arange(k) // groupsize).astype(np.int32)

    # Quantize each row against its group's scale/zero. Group stats are
    # computed over the rows assigned to that group.
    order = np.argsort(g_idx, kind="stable")
    wg = w[order].reshape(groups, groupsize, n)
    wmin = wg.min(axis=1)
    wmax = wg.max(axis=1)
    scales = ((wmax - wmin) / 15.0).astype(np.float32)
    scales = np.maximum(scales, 1e-8)
    zero = np.clip(np.round(-wmin / scales), 1, 15).astype(np.uint8)  # true zero-point ≥1 so stored z-1 ≥0

    qg = np.clip(
        np.round(wg / scales[:, None, :]) + zero[:, None, :].astype(np.float32),
        0,
        15,
    ).astype(np.uint8)
    q = np.empty((k, n), dtype=np.uint8)
    q[order] = qg.reshape(k, n)

    out = {
        "qweight": pack_gptq_qweight(q),
        "qzeros": pack_gptq_qzeros(zero - 1),  # GPTQ stores zero-1
        "scales": scales.astype(np.float16),
    }
    if act_order:
        out["g_idx"] = g_idx
    return out


# ---------------------------------------------------------------------------
# Tensor-parallel retiling (no reference counterpart — the reference's only
# multi-GPU mechanism is per-layer placement, model.py:636-668, which never
# splits a matmul; here Megatron-style TP shards columns/rows of the packed
# layout over the mesh's ``tp`` axis, parallel/mesh.py)
# ---------------------------------------------------------------------------

def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def tp_chunk(total: int, tp: int, step: int) -> int:
    """Uniform per-shard chunk covering ``total`` split ``tp`` ways at
    ``step`` alignment; the last shard(s) may cover fewer true elements
    (their tails are zero-padded by the retile functions)."""
    return _ceil_to(-(-total // tp), step)


def retile_out_for_tp(
    qt: QuantTensor, tp: int, chunk: "int | None" = None
) -> QuantTensor:
    """Re-tile output columns into ``tp`` independently padded segments.

    Column-parallel (Megatron 'out') sharding needs each shard's columns to
    be a self-contained npair layout: shard ``t`` holds true columns
    ``[t*chunk, min((t+1)*chunk, n))`` — ``chunk`` defaults to an even
    split — zero-extended to ``chunk`` width and padded to N_ALIGN like any
    npair tensor. A matching row-parallel consumer (retile_in_for_tp with
    the same ``chunk``) lines up with the zero tails, which lets K splits
    land off group boundaries (e.g. 65B's intermediate 22016 over tp=8).
    The stored width becomes ``tp * padded_n(chunk)`` and ``out_features``
    becomes ``tp * chunk`` so the per-shard local view is exactly
    ``out_features // tp`` columns — see localize_for_tp. x_map (a K-side
    permutation) is unaffected.
    """
    assert qt.layout == "npair" and qt.tp_segments == 1
    assert qt.w8 is None, "retile before attaching the w8 image"
    if tp == 1:
        return qt
    n = qt.out_features
    if chunk is None:
        assert n % tp == 0, (n, tp)
        chunk = n // tp
    assert chunk * tp >= n, (chunk, tp, n)
    if (
        chunk * tp == n
        and chunk % N_ALIGN == 0
        and qt.padded_out_features == n
    ):
        # segments already coincide with aligned blocks of the stored
        # layout — an even column split needs no repack, only the marker
        return dataclasses.replace(qt, tp_segments=tp)
    seg_pad = padded_n(chunk)
    q = unpack_npair(np.asarray(qt.qweight))          # [K, N_pad] uint8
    s = np.asarray(qt.scales)
    z = np.asarray(qt.zscale)
    gsz = s.shape[0]
    k = qt.in_features
    qn = np.zeros((k, tp * seg_pad), np.uint8)
    sn = np.zeros((gsz, tp * seg_pad), s.dtype)
    zn = np.zeros((gsz, tp * seg_pad), z.dtype)
    for t in range(tp):
        lo = t * chunk
        hi = min((t + 1) * chunk, n)
        if hi <= lo:
            continue
        dst = slice(t * seg_pad, t * seg_pad + (hi - lo))
        qn[:, dst] = q[:, lo:hi]
        sn[:, dst] = s[:, lo:hi]
        zn[:, dst] = z[:, lo:hi]
    return dataclasses.replace(
        qt,
        qweight=pack_npair(qn),
        scales=sn,
        zscale=zn,
        out_features=tp * chunk,
        tp_segments=tp,
    )


def retile_in_for_tp(
    qt: QuantTensor, tp: int, row_step: int = 128,
    chunk: "int | None" = None,
) -> QuantTensor:
    """Re-tile input rows into ``tp`` segments for row-parallel ('in')
    sharding (o/down projections; partial outputs psum over tp).

    Shard ``t`` holds true K rows ``[t*chunk, min((t+1)*chunk, k))``,
    zero-padded (zero-scale groups) to the uniform ``chunk`` — which must
    hold whole quantization groups and defaults to
    ``tp_chunk(k, tp, lcm(row_step, groupsize))`` so every shard's local K
    is kernel-legal even when ``k/tp`` is not group-aligned. When the split
    is exact the packed rows already slice cleanly and only the metadata
    changes. ``in_features`` becomes ``tp * chunk``; the activation fed per
    shard must carry matching zero features in its tail (column-parallel
    producers retiled with the same ``chunk`` provide exactly that). x_map
    rows are sliced with the chunks; padded entries gather index 0 (their
    zero-scale rows contribute nothing).
    """
    import math as _math

    assert qt.layout == "npair" and qt.tp_segments == 1
    assert qt.w8 is None, "retile before attaching the w8 image"
    if tp == 1:
        return qt
    k = qt.in_features
    gs = qt.groupsize
    step = _math.lcm(row_step, gs)
    if chunk is None:
        chunk = tp_chunk(k, tp, step)
    assert chunk % gs == 0 and chunk * tp >= k, (chunk, gs, tp, k)
    if chunk * tp == k:
        return dataclasses.replace(qt, tp_segments=tp)
    q = unpack_npair(np.asarray(qt.qweight))          # [K, N_pad]
    s = np.asarray(qt.scales)
    z = np.asarray(qt.zscale)
    n_pad = q.shape[1]
    qn = np.zeros((tp * chunk, n_pad), np.uint8)
    sn = np.zeros((tp * chunk // gs, n_pad), s.dtype)
    zn = np.zeros((tp * chunk // gs, n_pad), z.dtype)
    xm = None
    if qt.x_map is not None:
        xm = np.zeros((tp * chunk,), np.int32)
        xsrc = np.asarray(qt.x_map, np.int32)
    for t in range(tp):
        lo = t * chunk
        hi = min((t + 1) * chunk, k)
        if hi <= lo:
            continue
        rows = hi - lo
        qn[t * chunk : t * chunk + rows] = q[lo:hi]
        # spans stay group-aligned: k (wire format) and chunk are both
        # multiples of gs, so no scale row ever mixes true and pad rows
        assert rows % gs == 0, (rows, gs)
        sg = slice(t * chunk // gs, (t * chunk + rows) // gs)
        sn[sg] = s[lo // gs : hi // gs]
        zn[sg] = z[lo // gs : hi // gs]
        if xm is not None:
            xm[t * chunk : t * chunk + rows] = xsrc[lo:hi]
    return dataclasses.replace(
        qt,
        qweight=pack_npair(qn),
        scales=sn,
        zscale=zn,
        x_map=None if xm is None else xm,
        in_features=tp * chunk,
        tp_segments=tp,
    )


def fuse_quant_tensors_tp(qts: "list[QuantTensor]", tp: int) -> QuantTensor:
    """TP-aware projection fusion: like concat_quant_tensors, but the parts'
    per-shard segments interleave so an even tp column split hands every
    shard its own fused [part0_loc | part1_loc | ...] block. Inputs must
    already be retiled with the SAME tp (retile_out_for_tp)."""
    first = qts[0]
    for qt in qts:
        assert qt.tp_segments == tp and qt.layout == "npair"
        assert qt.in_features == first.in_features
        assert qt.groupsize == first.groupsize
        assert qt.x_map is None, "cannot fuse act-order tensors"
    import jax.numpy as jnp

    def interleave(arrs, widths):
        # arrs: per-part packed arrays [rows, tp*w_p]; widths in array cols
        segs = []
        for t in range(tp):
            for a, w in zip(arrs, widths):
                segs.append(a[:, t * w : (t + 1) * w])
        return jnp.concatenate([jnp.asarray(s) for s in segs], axis=1)

    qw_w = [qt.qweight.shape[1] // tp for qt in qts]
    sc_w = [qt.scales.shape[1] // tp for qt in qts]
    return QuantTensor(
        qweight=interleave([np.asarray(qt.qweight) for qt in qts], qw_w),
        scales=interleave([np.asarray(qt.scales) for qt in qts], sc_w),
        zscale=interleave([np.asarray(qt.zscale) for qt in qts], sc_w),
        x_map=None,
        in_features=first.in_features,
        # fused convention (concat_quant_tensors): out_features = total
        # stored width, so the local view is stored_width // tp
        out_features=sum(qt.padded_out_features for qt in qts),
        groupsize=first.groupsize,
        layout="npair",
        tp_segments=tp,
    )


def localize_for_tp(qt: QuantTensor, mode: str) -> QuantTensor:
    """Rewrite a retiled tensor's metadata to the per-shard local view
    (called inside shard_map, where the array leaves are already local).
    ``mode``: 'out' (column-parallel) or 'in' (row-parallel)."""
    tp = qt.tp_segments
    if tp == 1:
        return qt
    if mode == "out":
        return dataclasses.replace(
            qt, out_features=qt.out_features // tp, tp_segments=1
        )
    assert mode == "in"
    return dataclasses.replace(
        qt, in_features=qt.in_features // tp, tp_segments=1
    )


def permute_out_columns(qt: QuantTensor, perm: np.ndarray) -> QuantTensor:
    """Reorder a packed npair tensor's TRUE output columns by ``perm``
    (host-side unpack → gather → repack; padded columns stay zero-scaled).

    Used by the act-order down-proj fold (formats/loader.py): new column j
    holds old column perm[j].
    """
    assert qt.layout == "npair"
    perm = np.asarray(perm, np.int64)
    n = qt.out_features
    assert perm.shape == (n,)
    q = unpack_npair(np.asarray(qt.qweight))          # [K, N_pad]
    qp = np.zeros_like(q)
    qp[:, :n] = q[:, :n][:, perm]
    s = np.asarray(qt.scales)
    z = np.asarray(qt.zscale)
    sp = np.zeros_like(s)
    zp = np.zeros_like(z)
    sp[:, :n] = s[:, :n][:, perm]
    zp[:, :n] = z[:, :n][:, perm]
    # host arrays out: later host transforms (tp retiling) would otherwise
    # round-trip the device; callers upload once at the end of loading
    return dataclasses.replace(
        qt, qweight=pack_npair(qp), scales=sp, zscale=zp,
    )
