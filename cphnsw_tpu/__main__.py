"""CLI entrypoint for ``python -m cphnsw_tpu`` (cphnsw-tpu-eval).

Mirrors /root/reference/cphnsw/__main__.py:17-69: the same --config YAML
contract and JSON-lines event output (benchmark_start, summary)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def _load_yaml(path: Path) -> dict:
    try:
        import yaml

        with path.open() as f:
            return yaml.safe_load(f)
    except ImportError:
        # minimal fallback: the benchmark config is a 2-level yaml
        cfg: dict = {}
        section = None
        for line in path.read_text().splitlines():
            if not line.strip() or line.strip().startswith("#"):
                continue
            if not line.startswith(" "):
                section = line.rstrip(":").strip()
                cfg[section] = {}
            else:
                key, _, val = line.strip().partition(":")
                val = val.strip()
                if val.isdigit():
                    val = int(val)
                cfg[section][key.strip()] = val
        return cfg


def main(argv: list[str] | None = None) -> None:
    from cphnsw_tpu.utils.datasets import ALL_DATASETS
    from cphnsw_tpu.utils.eval import MB_PER_GIB, SECS_PER_MIN, run_benchmark

    parser = argparse.ArgumentParser(
        prog="cphnsw_tpu",
        description="Run CP-HNSW-TPU benchmark evaluation.",
    )
    parser.add_argument(
        "--config", type=Path, required=True,
        help="Path to benchmark config YAML.",
    )
    args = parser.parse_args(argv)

    cfg = _load_yaml(args.config)
    output_dir = Path(cfg["run"]["output_dir"])
    output_dir.mkdir(parents=True, exist_ok=True)

    dataset = cfg["data"]["dataset"]
    base_dir = Path(cfg["data"]["base_dir"])
    datasets = ALL_DATASETS if dataset == "all" else [dataset]

    k = cfg["eval"]["k"]
    n_runs = cfg["eval"]["n_runs"]

    all_outputs = []
    for ds_name in datasets:
        print(
            json.dumps({"event": "benchmark_start", "dataset": ds_name}),
            flush=True,
        )
        output = run_benchmark(ds_name, base_dir, k, n_runs, output_dir)
        all_outputs.append(output)

    for output in all_outputs:
        dataset_name = output["metadata"]["dataset"]
        for algo in output["results"]:
            summary = {
                "event": "summary",
                "dataset": dataset_name,
                "algorithm": algo["algorithm"],
                "build_time_min": round(algo["build_time_s"] / SECS_PER_MIN, 4),
                "memory_gib": round(algo["memory_mb"] / MB_PER_GIB, 4),
                "recall_at_10": algo["recall_at_10"],
                "qps": algo["qps"],
            }
            print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
