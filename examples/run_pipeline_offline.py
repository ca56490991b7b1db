"""Offline demo of the full ETL pipeline: stages synthetic envelope
JSON instead of real HTTP (inject a fetcher), then runs the same
fail-soft orchestration the reference performs — download -> normalize
(explode/flatten/drop/decode) -> parquet per endpoint.

Run:  python examples/run_pipeline_offline.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_etl_spark.config import Config
from rust_etl_spark.pipeline import run_pipeline
from rust_etl_spark.session import get_spark

ENVELOPE = {
    "resultado": [
        {"id": 1, "nome": "alpha", "codigo": [104, 105]},
        {"id": 2, "nome": "beta", "codigo": [111, 107]},
    ],
    "totalRegistros": 2,
    "totalPaginas": 1,
    "paginasRestantes": 0,
    "links": ["self"],
    "dataHoraConsulta": "2026-08-13T00:00:00",
    "timeZoneAtual": "UTC",
    "dataHoraAtualizacao": "2026-08-13T00:00:00",
}


def fake_fetch(session, url, dest, **kw):
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(ENVELOPE, f)
    return os.path.getsize(dest)


def main() -> None:
    spark = get_spark("pipeline-offline-demo")
    cfg = Config.load_from_file(os.path.join(os.path.dirname(__file__), "endpoints.toml"))
    data_dir = tempfile.mkdtemp(prefix="etl_demo_")
    report = run_pipeline(
        spark, cfg, data_dir=data_dir, fetcher=fake_fetch, session_factory=lambda: None
    )
    for r in report.results:
        print(f"{r.api}/{r.group}/{r.key:8s} -> {r.status} ({r.seconds:.2f}s)")
    out = os.path.join(data_dir, "transparency_portal", "contracts", "all.parquet")
    print("\nnormalized output (envelope exploded, technical columns dropped, codepoints decoded):")
    spark.read.parquet(out).show()


if __name__ == "__main__":
    main()
