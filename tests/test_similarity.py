"""IVF ANN (operators/similarity.py): recall against the exact brute-force
baseline, and determinism across runs (fixed centroids, no RNG)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def test_ann_ivf_recall_and_determinism(spark):
    from osmi_addresses_spark.driver_queries import s_ann_ivf, s_ann_topk

    exact = {(r["q_id"], r["n_id"]) for r in s_ann_topk(spark, SF_DIR).collect()}
    approx_rows = sorted(
        (r["q_id"], r["n_id"], r["rank"]) for r in s_ann_ivf(spark, SF_DIR).collect()
    )
    approx = {(q, n) for q, n, _ in approx_rows}
    assert exact, "baseline returned nothing"
    recall = len(approx & exact) / len(exact)
    # nprobe=4 of nlist=16 → candidate volume ~25% of brute force; the
    # deterministic (non-kmeans) centroids trade some recall for
    # reproducibility — 0.6 is the floor we promise
    assert recall >= 0.6, f"recall@5 {recall:.2f} < 0.6"

    again = sorted(
        (r["q_id"], r["n_id"], r["rank"]) for r in s_ann_ivf(spark, SF_DIR).collect()
    )
    assert again == approx_rows, "IVF result not deterministic"
