"""Split a .safetensors file into size-capped shards + HF-style index.

Parity with the reference's util/shard.py:30-80: deterministic greedy
packing by tensor order, `model.safetensors.index.json` with weight_map and
total_size metadata. Usage:

    python -m exllama_tpu.utils.shard input.safetensors 4  # GB per shard
"""

from __future__ import annotations

import json
import os
import sys


def shard_file(input_path: str, max_gb: float, output_dir: str | None = None):
    import safetensors
    import safetensors.numpy

    output_dir = output_dir or os.path.dirname(os.path.abspath(input_path))
    base = os.path.basename(input_path).rsplit(".", 1)[0]
    limit = int(max_gb * 1024**3)

    with safetensors.safe_open(input_path, framework="np") as f:
        keys = list(f.keys())
        shards: list[list[str]] = [[]]
        sizes = [0]
        for key in keys:
            t = f.get_slice(key)
            nbytes = 1
            for d in t.get_shape():
                nbytes *= d
            # dtype size from the tensor itself (load lazily only if needed)
            nbytes *= _dtype_bytes(t.get_dtype())
            if sizes[-1] + nbytes > limit and shards[-1]:
                shards.append([])
                sizes.append(0)
            shards[-1].append(key)
            sizes[-1] += nbytes

        n = len(shards)
        weight_map = {}
        total = 0
        written = []
        for i, shard_keys in enumerate(shards):
            name = f"{base}-{i + 1:05d}-of-{n:05d}.safetensors"
            tensors = {k: f.get_tensor(k) for k in shard_keys}
            safetensors.numpy.save_file(
                tensors, os.path.join(output_dir, name)
            )
            written.append(os.path.join(output_dir, name))
            for k in shard_keys:
                weight_map[k] = name
                total += tensors[k].nbytes
            print(f" -- wrote {name} ({sizes[i] / 1024**3:.2f} GB)")

    index = {
        "metadata": {"total_size": total},
        "weight_map": weight_map,
    }
    index_path = os.path.join(output_dir, f"{base}.safetensors.index.json")
    with open(index_path, "w") as fo:
        json.dump(index, fo, indent=2)
    print(f" -- wrote {index_path}")
    return written


def _dtype_bytes(dtype_str: str) -> int:
    return {
        "F64": 8, "I64": 8, "U64": 8,
        "F32": 4, "I32": 4, "U32": 4,
        "F16": 2, "BF16": 2, "I16": 2, "U16": 2,
        "I8": 1, "U8": 1, "BOOL": 1,
    }.get(str(dtype_str).upper().replace("FLOAT", "F").replace("INT", "I"), 4)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("usage: python -m exllama_tpu.utils.shard <file.safetensors> <GB>")
        sys.exit(1)
    shard_file(sys.argv[1], float(sys.argv[2]))
