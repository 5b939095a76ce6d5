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


def test_merge_null_config_value_keeps_nonnull_default():
    """An explicit null in a config file must not erase a non-null
    engine default (a null run_dir would crash os.makedirs(None) far
    from the config that caused it); keys whose default IS None keep
    accepting null as a no-op."""
    defaults = {"run_dir": "./runs/default", "sample_size": None, "viz": 1}
    cfg = merge_config(
        {}, {"run_dir": None, "sample_size": None, "viz": 0}, defaults
    )
    assert cfg["run_dir"] == "./runs/default"
    assert cfg["sample_size"] is None
    assert cfg["viz"] == 0


def _two_clique_edge_lines(bridge: bool) -> list[str]:
    lines = []
    for block in (range(0, 4), range(4, 8)):
        block = list(block)
        for i in block:
            for j in block:
                if i < j:
                    lines.append(f"{i} {j}")
    if bridge:
        lines.append("0 4")
    return lines


def test_ground_truth_file_drives_nmi(spark, tmp_path, capsys):
    """A configured ground_truth_file is actually loaded and evaluated
    (reference __main__.py:368-383: the file is an edge list labelled by
    connected component): the two-clique GT makes the final NMI 1.0."""
    import json as _json

    import run_pipeline as rp

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "edges.txt").write_text(
        "\n".join(_two_clique_edge_lines(bridge=True)) + "\n"
    )
    # ground truth: the same graph WITHOUT the bridge -> two components
    (data_dir / "gt.txt").write_text(
        "\n".join(_two_clique_edge_lines(bridge=False)) + "\n"
    )
    rc = rp.main(
        [
            "--data-dir", str(data_dir),
            "--input-edge-file", "edges.txt",
            "--ground-truth-file", "gt.txt",
            "--run-dir", str(tmp_path / "out"),
            "--viz", "0",
        ]
    )
    assert rc == 0
    stdout = capsys.readouterr().out
    metrics = _json.JSONDecoder().raw_decode(stdout[stdout.index("{"):])[0]
    nmis = [
        v.get("nmi")
        for v in metrics.values()
        if isinstance(v, dict) and "nmi" in v
    ]
    assert nmis, "no evaluation bundle carried an nmi key"
    assert any(v is not None for v in nmis)
    final_nmi = metrics["final"]["nmi"] if "final" in metrics else max(
        v for v in nmis if v is not None
    )
    assert final_nmi == pytest.approx(1.0)


def test_missing_ground_truth_file_warns_not_crashes(tmp_path, capsys):
    import run_pipeline as rp

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "edges.txt").write_text(
        "\n".join(_two_clique_edge_lines(bridge=True)) + "\n"
    )
    rc = rp.main(
        [
            "--data-dir", str(data_dir),
            "--input-edge-file", "edges.txt",
            "--ground-truth-file", "nope.txt",
            "--run-dir", str(tmp_path / "out"),
            "--viz", "0",
        ]
    )
    assert rc == 0
    assert "ground_truth_file not found" in capsys.readouterr().err


def test_self_loop_lines_are_logged(tmp_path, capsys):
    """Self-loop edge lines are dropped (the engine's graph model is
    loop-free, an intentional divergence from the reference's nx.Graph)
    and the count is reported on stderr rather than silently vanishing."""
    import run_pipeline as rp

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "edges.txt").write_text(
        "\n".join(_two_clique_edge_lines(bridge=True) + ["2 2", "5 5"]) + "\n"
    )
    rc = rp.main(
        [
            "--data-dir", str(data_dir),
            "--input-edge-file", "edges.txt",
            "--run-dir", str(tmp_path / "out"),
            "--viz", "0",
        ]
    )
    assert rc == 0
    assert "discarded 2 self-loop line(s)" in capsys.readouterr().err
