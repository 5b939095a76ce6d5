"""Config-file loading with reference merge semantics.

The reference resolves a YAML/JSON config file plus argparse overrides
(reference __main__.py:64-75 ``load_config`` and 581-595 merge): an
option explicitly given on the command line wins; otherwise the config
file's value; otherwise the built-in default.  This module reproduces
that contract for ``run_pipeline.py`` and accepts every key of the
reference's ``config.yaml`` (reference config.yaml:1-23).
"""

from __future__ import annotations

import json
import os
from typing import Any

# every key the reference config.yaml documents (config.yaml:1-23).
# run_pipeline maps output_dir -> --run-dir and visualization_dir -> the
# viz subdirectory; time_limit is accepted for file compatibility but the
# Spark pipeline has no per-stage wall budget (checkpoint/resume replaces
# it) — it is echoed back with a warning instead of silently dropped.
REFERENCE_KEYS = {
    "data_dir",
    "sample_size",
    "input_edge_file",
    "ground_truth_file",
    "size_threshold",
    "target_subcommunities",
    "modularity_threshold",
    "max_iterations",
    "time_limit",
    "fast_mode",
    "output_dir",
    "visualization_dir",
}

# engine-native keys (the run_pipeline CLI surface)
ENGINE_KEYS = {
    "transcripts",
    "synth_convs",
    "synth_tools",
    "synth_clusters",
    "run_dir",
    "viz",
    "master",
}


def load_config(path: str) -> dict[str, Any]:
    """Load a YAML or JSON config file by extension (reference
    __main__.py:64-75).  YAML parsing uses PyYAML when present and falls
    back to a flat ``key: value`` line parser (enough for the reference's
    config.yaml shape) when it is not."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml

            out = yaml.safe_load(text)
        except ImportError:
            out = _parse_flat_yaml(text)
    elif path.endswith(".json"):
        out = json.loads(text)
    else:
        raise ValueError("Config file must be YAML or JSON")
    if out is None:
        return {}
    if not isinstance(out, dict):
        raise ValueError(f"Config root must be a mapping, got {type(out).__name__}")
    return out


def _parse_flat_yaml(text: str) -> dict[str, Any]:
    """Minimal flat ``key: value  # comment`` parser — the reference
    config.yaml shape — for environments without PyYAML."""
    out: dict[str, Any] = {}
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        out[key.strip()] = _coerce_scalar(val.strip())
    return out


def _coerce_scalar(s: str) -> Any:
    low = s.lower()
    if low in ("null", "~", "none", ""):
        return None
    if low == "true":
        return True
    if low == "false":
        return False
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return s.strip("'\"")


def merge_config(
    cli: dict[str, Any], config: dict[str, Any], defaults: dict[str, Any]
) -> dict[str, Any]:
    """Reference merge order (reference __main__.py:581-595): explicit
    CLI value > config-file value > default.  ``cli`` holds only values
    the user actually passed (argparse with None defaults); unknown
    config keys raise so typos fail loudly rather than silently using a
    default."""
    unknown = set(config) - REFERENCE_KEYS - ENGINE_KEYS
    if unknown:
        raise ValueError(f"Unknown config keys: {sorted(unknown)}")
    out = dict(defaults)
    for k, v in config.items():
        if v is None and defaults.get(k) is not None:
            # an explicit null in a config file does not erase a non-null
            # engine default (mirrors the reference's ``config.get(k,
            # default)`` fallback; a null run_dir would otherwise crash
            # os.makedirs(None) far from the config that caused it)
            continue
        out[k] = v
    for k, v in cli.items():
        if v is not None:
            out[k] = v
    return out
