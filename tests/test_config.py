"""Config-file entry parity (reference __main__.py:64-75, 581-595 +
config.yaml:1-23): YAML/JSON loading, CLI > config > default merge, and
an end-to-end run_pipeline invocation driven by a config file."""

from __future__ import annotations

import json

import pytest

from csd363_sin_spark.config import _parse_flat_yaml, load_config, merge_config

# the reference's documented config surface (reference config.yaml:1-23)
REFERENCE_CONFIG_YAML = """\
# Configuration for Community Detection Pipeline

# Data settings
data_dir: data
sample_size: null  # Reduced from 100000 for better performance

# Dataset files
input_edge_file: undirected.txt  # File used to create the graph
ground_truth_file: ground_truth.txt  # File containing ground truth communities

# Algorithm parameters
size_threshold: 5000  # Communities larger than this will be refined
target_subcommunities: 5  # Target number of subcommunities in refinement
modularity_threshold: 0.3  # Communities with modularity below this will be enhanced with Infomap

# Performance optimization settings
max_iterations: 30  # Limit Girvan-Newman iterations
time_limit: 18000  # 5 minute time limit per algorithm
fast_mode: True  # Use approximation algorithms for large graphs

# Output settings
output_dir: results  # Directory for saving results
visualization_dir: community_visualizations  # Directory for visualizations
"""


def test_load_reference_config_yaml(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_CONFIG_YAML)
    cfg = load_config(str(p))
    assert cfg["size_threshold"] == 5000
    assert cfg["sample_size"] is None
    assert cfg["modularity_threshold"] == 0.3
    assert cfg["fast_mode"] is True
    assert cfg["input_edge_file"] == "undirected.txt"
    assert cfg["output_dir"] == "results"


def test_flat_yaml_fallback_matches_pyyaml(tmp_path):
    import yaml

    assert _parse_flat_yaml(REFERENCE_CONFIG_YAML) == yaml.safe_load(
        REFERENCE_CONFIG_YAML
    )


def test_load_json_config(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"size_threshold": 123, "fast_mode": False}))
    cfg = load_config(str(p))
    assert cfg == {"size_threshold": 123, "fast_mode": False}


def test_load_config_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "missing.yaml"))
    p = tmp_path / "config.txt"
    p.write_text("size_threshold: 1")
    with pytest.raises(ValueError):
        load_config(str(p))


def test_merge_precedence():
    defaults = {"size_threshold": 5000, "fast_mode": 1, "run_dir": "./runs/default"}
    config = {"size_threshold": 1000, "fast_mode": False}
    cli = {"size_threshold": 42, "fast_mode": None, "run_dir": None}
    out = merge_config(cli, config, defaults)
    assert out["size_threshold"] == 42  # explicit CLI wins
    assert out["fast_mode"] is False  # config beats default
    assert out["run_dir"] == "./runs/default"  # default survives


def test_merge_rejects_unknown_keys():
    with pytest.raises(ValueError, match="Unknown config keys"):
        merge_config({}, {"szie_threshold": 1}, {})


def test_resolve_config_roundtrip(tmp_path):
    from run_pipeline import resolve_config

    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_CONFIG_YAML)
    cfg = resolve_config(
        ["--config", str(p), "--size-threshold", "77", "--viz", "0"]
    )
    assert cfg["size_threshold"] == 77  # CLI override
    assert cfg["max_iterations"] == 30  # from config file
    assert cfg["run_dir"] == "results"  # output_dir alias applied
    assert cfg["visualization_dir"] == "community_visualizations"
    assert cfg["fast_mode"] is True
    assert cfg["viz"] == 0


def test_run_pipeline_config_file_end_to_end(spark, tmp_path):
    """--config + --input-edge-file drives the whole pipeline: the
    reference's entry contract (edge-file input resolved under data_dir,
    prefix sample_size, config-file thresholds) over a tiny two-clique
    graph."""
    import run_pipeline as rp

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    # two 4-cliques joined by one bridge, plus a comment + junk line
    lines = ["# comment", "bad line x"]
    for block in (range(0, 4), range(4, 8)):
        block = list(block)
        for i in block:
            for j in block:
                if i < j:
                    lines.append(f"{i} {j}")
    lines.append("0 4")
    (data_dir / "edges.txt").write_text("\n".join(lines) + "\n")

    cfgfile = tmp_path / "run.yaml"
    cfgfile.write_text(
        f"data_dir: {data_dir}\n"
        "input_edge_file: edges.txt\n"
        "size_threshold: 5000\n"
        "modularity_threshold: 0.3\n"
        "fast_mode: true\n"
        f"output_dir: {tmp_path / 'out'}\n"
    )
    rc = rp.main(["--config", str(cfgfile), "--viz", "0"])
    assert rc == 0
    final = spark.read.parquet(str(tmp_path / "out" / "final_assign"))
    rows = {r["vertex_id"]: r["comm"] for r in final.collect()}
    assert set(rows) == set(range(8))
    # the two cliques separate
    assert len({rows[i] for i in range(0, 4)}) == 1
    assert len({rows[i] for i in range(4, 8)}) == 1
    assert rows[0] != rows[4]
