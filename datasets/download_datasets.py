"""Fetch the evaluation text corpora used by the perplexity benchmarks.

TPU-native analogue of the reference's datasets/download_datasets.py: pulls
wikitext-2 and ptb from HuggingFace `datasets` and writes them as plain text /
jsonl files consumable by exllama_tpu.perplexity.Perplexity. The bundled
`wikitext2_val_sample.jsonl` (public wikitext-2 validation text, same sample
the reference ships) is the fixed fixture for BASELINE ppl comparisons and
needs no download.

Requires the optional `datasets` package (not bundled); run wherever you have
network access and copy the outputs next to this script.
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def download_hf(filename, dataset, subset, split, key, div):
    from datasets import load_dataset

    path = os.path.join(HERE, filename)
    if os.path.exists(path):
        print(f" -- exists: {filename}")
        return
    print(f" -- downloading {dataset}/{subset}:{split} -> {filename}")
    data = load_dataset(dataset, subset, split=split)
    text = div.join(row[key] for row in data)
    if filename.endswith(".jsonl"):
        with open(path, "w", encoding="utf-8") as f:
            for row in data:
                if row[key].strip():
                    f.write(json.dumps({"text": row[key]}) + "\n")
    else:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)


def main():
    # Same corpora the reference benchmarks against (GPTQ-for-LLaMa method
    # uses the raw wikitext2 test split in fixed 2048-token windows).
    download_hf("wikitext2.txt", "wikitext", "wikitext-2-raw-v1", "test", "text", "")
    download_hf("ptb.txt", "ptb_text_only", "penn_treebank", "validation", "sentence", "\n\n")
    download_hf("wikitext2_val.jsonl", "wikitext", "wikitext-2-raw-v1", "validation", "text", "")


if __name__ == "__main__":
    main()
