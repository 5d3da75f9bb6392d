"""Generate docs/PRETRAINED.md from the registry yaml.

Mirrors the reference's docs/pretrained.rst (a browsable model-zoo
table; reference: tiatoolbox docs/pretrained.rst + data/
pretrained_model.yaml) but is generated so it can never drift from
the registry. Run: ``python scripts/gen_pretrained_docs.py``.
"""

from __future__ import annotations

import collections
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parent.parent
REGISTRY = REPO / "tiatoolbox_tpu" / "data" / "pretrained_model.yaml"
OUT = REPO / "docs" / "PRETRAINED.md"

ENGINE_BY_IOCONFIG = {
    "IOPatchPredictorConfig": "PatchPredictor / DeepFeatureExtractor",
    "IOSegmentorConfig": "SemanticSegmentor / NucleusDetector",
    "IOInstanceSegmentorConfig": "MultiTaskSegmentor",
}


def _res_str(entry: dict) -> str:
    io = entry.get("ioconfig", {}).get("kwargs", {})
    res = io.get("input_resolutions") or []
    if not res:
        return "—"
    parts = [f"{r['resolution']} {r['units']}" for r in res[:2]]
    if len(res) > 2:
        parts.append(f"(+{len(res) - 2})")
    return ", ".join(parts)


def _shape_str(entry: dict) -> str:
    io = entry.get("ioconfig", {}).get("kwargs", {})
    shp = io.get("patch_input_shape")
    if not shp:
        return "—"
    out = f"{shp[0]}x{shp[1]}"
    oshp = io.get("patch_output_shape")
    if oshp:
        out += f" → {oshp[0]}x{oshp[1]}"
    return out


def main() -> None:
    reg = yaml.safe_load(REGISTRY.read_text())
    by_family: dict[str, list] = collections.defaultdict(list)
    for name, entry in reg.items():
        arch = entry["architecture"]["class"]
        family = arch.split(".")[0]
        by_family[family].append((name, entry))

    lines = [
        "# Pretrained model zoo",
        "",
        "Generated from `tiatoolbox_tpu/data/pretrained_model.yaml` by",
        "`scripts/gen_pretrained_docs.py` — do not edit by hand.",
        "",
        f"{len(reg)} entries (the reference registry has 66; extra entries",
        "cover the foundation-encoder and KongNet variants). Every entry",
        "resolves through `get_pretrained_model(name)`: torch checkpoints",
        "are fetched from the `hf_repo_id` (or read from",
        "`$TIATOOLBOX_TPU_HOME/models/<name>.pth`), converted to flax",
        "params once, and cached as `.npz`.",
        "",
        "Usage:",
        "",
        "```python",
        "from tiatoolbox_tpu.models import get_pretrained_model",
        'model, ioconfig = get_pretrained_model("resnet18-kather100k")',
        "```",
        "",
    ]

    order = sorted(
        by_family, key=lambda f: (-len(by_family[f]), f)
    )
    for family in order:
        entries = sorted(by_family[family])
        arch_cls = entries[0][1]["architecture"]["class"]
        lines.append(f"## {family} ({arch_cls}) — {len(entries)} entries")
        lines.append("")
        lines.append("| name | engine | input res | patch shape | HF repo |")
        lines.append("|---|---|---|---|---|")
        for name, entry in entries:
            io_cls = entry.get("ioconfig", {}).get("class", "—")
            engine = ENGINE_BY_IOCONFIG.get(io_cls, io_cls)
            repo = entry.get("hf_repo_id", "—")
            lines.append(
                f"| `{name}` | {engine} | {_res_str(entry)} | "
                f"{_shape_str(entry)} | {repo} |"
            )
        lines.append("")

    OUT.write_text("\n".join(lines) + "\n")
    print(f"wrote {OUT} ({len(reg)} entries, {len(by_family)} families)")


if __name__ == "__main__":
    main()
