"""Measure the reference's AVX2 CPU performance on the bench.py workload.

Produces baseline_cpu.json at the repo root (consumed by bench.py's
vs_baseline).  Run manually: python native/measure_reference.py
"""

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
REF_INCLUDE = "/root/reference/include"


def main():
    sys.path.insert(0, str(ROOT))
    from cphnsw_tpu.utils.datasets import make_synthetic

    n, dim, k = 100_000, 128, 10
    ds = make_synthetic(f"synthetic-{n // 1000}k-{dim}d", n_queries=1024)

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        ds["base"].astype("float32").tofile(td / "base.raw")
        ds["queries"].astype("float32").tofile(td / "queries.raw")
        ds["groundtruth"][:, :k].astype("int32").tofile(td / "gt.raw")

        binary = td / "cphnsw_baseline"
        t0 = time.time()
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-mavx2", "-mfma", "-fopenmp",
                "-std=c++17", f"-I{REF_INCLUDE}",
                str(ROOT / "native/baseline/main.cpp"), "-o", str(binary),
            ],
            check=True,
        )
        print(f"compiled reference driver in {time.time() - t0:.1f}s")

        out = subprocess.run(
            [
                str(binary), str(td), str(n), str(dim),
                str(len(ds["queries"])), str(k), "1",
            ],
            check=True, capture_output=True, text=True,
        ).stdout.strip()
        print("reference:", out)
        res = json.loads(out)

    import os

    baseline = {
        "source": "self-measured reference (indrajeetadityaroy9/rabitq-ann-search) "
                  "AVX2 build on this machine",
        "nproc": os.cpu_count(),
        "qps_sift100k_1bit": res["qps"],
        "recall_at_10": res["recall_at_k"],
        "build_s": res["build_s"],
        "workload": f"synthetic-{n // 1000}k-{dim}d, k={k}, 1024 queries",
    }
    (ROOT / "baseline_cpu.json").write_text(json.dumps(baseline, indent=2))
    print("wrote baseline_cpu.json")


if __name__ == "__main__":
    main()
