#!/usr/bin/env python
"""semantic_dedup high-k A/B (r18): k=2000 clusters ≫ 32 cores, ~50
vectors each — the regime where the r17 per-cluster applyInPandas paid one
Arrow round-trip per cluster. Deterministic synthetic data (no RNG). Run
from either tree root with PYTHONPATH=$PWD. noop sink, 3 trials."""
import sys
import time

import numpy as np
from pyspark.sql import functions as F

from nexgap_spark.operators.similarity import semantic_dedup
from nexgap_spark.session import get_spark, materialize

K, PER, DIM = 2000, 50, 8


def main() -> None:
    spark = get_spark("q102_ab")
    # deterministic cluster layout: centroid c = unit-ish vector from a
    # fixed affine grid; member j = centroid + tiny per-member offset
    cent_rows = []
    for c in range(K):
        v = [((c * (d + 3) + d * 7) % 97 - 48) / 48.0 for d in range(DIM)]
        cent_rows.append((c, v))
    vec_rows = []
    for c in range(K):
        base = cent_rows[c][1]
        for j in range(PER):
            off = ((c * 31 + j * 17) % 13 - 6) / 6000.0
            vec_rows.append((c * PER + j, [x + off * ((d % 3) - 1) for d, x in enumerate(base)]))
    cents = spark.createDataFrame(cent_rows, "centroid_id long, embedding array<double>")
    vecs = materialize(
        spark.createDataFrame(vec_rows, "vec_id long, embedding array<double>")
    )
    for trial in range(3):
        t0 = time.perf_counter()
        out = semantic_dedup(vecs, cents, threshold=0.999999, dim=DIM)
        out.write.format("noop").mode("overwrite").save()
        print(f"[q102_ab] trial {trial}: {time.perf_counter() - t0:.3f}s", flush=True)
    # stable checksum so both trees can be compared for identical results
    agg = out.agg(F.count("*"), F.sum("vec_id")).collect()[0]
    print(f"[q102_ab] kept={agg[0]} sum={agg[1]}", flush=True)


if __name__ == "__main__":
    main()
