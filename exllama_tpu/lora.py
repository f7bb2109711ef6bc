"""LoRA adapters on quantized base weights.

Re-design of the reference's ``ExLlamaLora`` (lora.py): loads a PEFT adapter
(safetensors or torch .bin), parses
``model.layers.N.{self_attn,mlp}.{q,k,v,o,gate,up,down}_proj.lora_{A,B}``
keys, validates shapes against the target quantized matrices, transposes to
(in, out) orientation and pre-scales B by alpha/r (lora.py:99-103) so the
runtime is a plain unmerged low-rank add fused into the q4 matmul
(ops/quant.py q4_matmul(lora=...), mirroring exllama_ext.cpp:245-324).

TPU difference: adapters become a per-layer tuple of LayerLora pytrees that
threads through the model's unrolled layer loop — layers without an adapter
for an adapted projection get zero-filled A/B of the same rank (a zero
low-rank add is exact and XLA-cheap at small r).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_PROJ_NAMES = ("q", "k", "v", "o", "gate", "up", "down")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerLora:
    """One layer's adapter pairs ([in, r] / [r, out] each).
    ``None`` = projection not adapted anywhere in the model."""

    q: Optional[tuple[jax.Array, jax.Array]]
    k: Optional[tuple[jax.Array, jax.Array]]
    v: Optional[tuple[jax.Array, jax.Array]]
    o: Optional[tuple[jax.Array, jax.Array]]
    gate: Optional[tuple[jax.Array, jax.Array]]
    up: Optional[tuple[jax.Array, jax.Array]]
    down: Optional[tuple[jax.Array, jax.Array]]


class ExLlamaLora:
    """Host-side adapter object; pass to generators via ``generator.lora``."""

    def __init__(self, model, lora_config_path: str, lora_path: str):
        self.lora_config_path = lora_config_path
        self.lora_path = lora_path
        self.model = model
        self.bias_ignored = False

        with open(lora_config_path) as f:
            read_config = json.load(f)
        self.lora_r = read_config["r"]
        self.lora_alpha = float(read_config["lora_alpha"])
        self.lora_scaling = self.lora_alpha / self.lora_r
        if read_config.get("fan_in_fan_out"):
            raise ValueError("fan_in_fan_out mode not supported")

        if lora_path.endswith(".safetensors"):
            import safetensors

            with safetensors.safe_open(lora_path, framework="np") as f:
                raw = {k: f.get_tensor(k) for k in f.keys()}
        else:
            import torch

            raw = {
                k: v.to(torch.float32).numpy()
                for k, v in torch.load(
                    lora_path, map_location="cpu", weights_only=True
                ).items()
            }

        cfg = model.config
        n_layers = cfg.num_hidden_layers

        # Projection shapes from the config (the base QuantTensors may be
        # fused into qkv/gateup, see models/llama.fuse_layer_projections).
        qdim = cfg.num_attention_heads * cfg.head_dim
        kvdim = cfg.num_key_value_heads * cfg.head_dim
        proj_shapes = {
            "q": (cfg.hidden_size, qdim),
            "k": (cfg.hidden_size, kvdim),
            "v": (cfg.hidden_size, kvdim),
            "o": (qdim, cfg.hidden_size),
            "gate": (cfg.hidden_size, cfg.intermediate_size),
            "up": (cfg.hidden_size, cfg.intermediate_size),
            "down": (cfg.intermediate_size, cfg.hidden_size),
        }
        # per-projection dict: name -> {layer_idx: {"A": ..., "B": ...}}
        found: dict[str, dict[int, dict[str, np.ndarray]]] = {
            p: {} for p in _PROJ_NAMES
        }

        for key, tensor in raw.items():
            i = key.find("model.layers.")
            if i == -1:
                raise ValueError(f"unsupported key in {lora_path}: {key}")
            ks = key[i:].split(".")
            layer_idx = int(ks[2])
            proj = ks[4].replace("_proj", "")
            half = ks[5]
            if half == "bias":
                if np.max(np.abs(tensor)) > 1e-6:
                    raise ValueError(f"unsupported nonzero bias: {key}")
                self.bias_ignored = True
                continue
            if proj not in _PROJ_NAMES or half not in ("lora_A", "lora_B"):
                raise ValueError(f"unsupported key in {lora_path}: {key}")

            t_in, t_out = proj_shapes[proj]
            tensor = np.asarray(tensor, dtype=np.float32)
            if half == "lora_A":
                # PEFT stores A as [r, in]; validate in_features
                if tensor.shape[1] != t_in:
                    raise ValueError(f"incompatible shape: {key}")
            else:
                # B as [out, r]; validate out_features
                if tensor.shape[0] != t_out:
                    raise ValueError(f"incompatible shape: {key}")
            t = tensor.T.copy()  # → (in, r) / (r, out), reference lora.py:99
            if half == "lora_B" and self.lora_scaling != 1.0:
                t *= self.lora_scaling
            found[proj].setdefault(layer_idx, {})[half[-1]] = t

        # Act-order down-proj fold (formats/loader._fold_down_act_order):
        # gate/up base weights have permuted OUTPUT columns and down's
        # runtime input permutation is gone — adapters must match: gate/up
        # B columns and down A rows get the same permutation.
        down_folds = getattr(model.params, "_down_folds", None)

        # Build per-layer pytree tuple
        def proj_for_layer(proj: str, li: int):
            entries = found[proj]
            if not entries:
                return None  # projection not adapted anywhere
            k_in, n_out = proj_shapes[proj]
            r = self.lora_r
            halves = entries.get(li)
            if halves is None:
                a = np.zeros((k_in, r), np.float32)
                b = np.zeros((r, n_out), np.float32)
            else:
                if "A" not in halves or "B" not in halves:
                    raise ValueError(f"incomplete A/B pair: layer {li} {proj}")
                a, b = halves["A"], halves["B"]
            fold = down_folds[li] if down_folds is not None else None
            if fold is not None:
                if proj in ("gate", "up"):
                    b = b[:, fold]
                elif proj == "down":
                    a = a[fold, :]
            return (
                jnp.asarray(a, jnp.bfloat16),
                jnp.asarray(b, jnp.bfloat16),
            )

        self.stacked = tuple(
            LayerLora(**{p: proj_for_layer(p, li) for p in _PROJ_NAMES})
            for li in range(n_layers)
        )
