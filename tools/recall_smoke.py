"""sf1 recall-floor smoke for the n_centroids='auto' dial
(VERDICT r11 #7 — "the one knob a 100-TB operator would actually
turn").

The √n dial (``resolve_n_centroids('auto')`` = max(8, round(√n))) is
SCALING-measured for COST (nlist ∝ √n keeps per-bucket population
√n-bounded, 13.8× → 4.6× at 10× data), but its RECALL was asserted
only at fixture scales. First run of this smoke (r12) found the gap:
at the sf0.1 auto dial (nlist=45) a FIXED n_probe=2 reads recall@5
0.27 on the weakly clustered fixture (0.976 on the clustered sf1
replicas) — the probe budget must grow with the dial. The fix is
``n_probe='auto'`` = max(2, round(√nlist)) (candidate volume
n²/√nlist = n^(7/4), still sublinear; measured knee at sf0.1:
2→0.27, 4→0.41, 7→0.54, 11→0.67, 15→0.76). This smoke measures
recall@k of ``ivf_topk(n_centroids='auto', n_probe='auto')`` against
the blocked exact
brute force at each given scale dir and merges the readings into
SCALING.json under ``auto_dial_recall`` — so a dial regression (e.g.
a trainer change that degrades bucket quality exactly where the dial
grows) fails loudly in the artifact diff rather than silently at a
scale no pytest reaches.

r13 (VERDICT r12 next #5): the smoke grew a sign-LSH leg — the same
fixed-dial risk applies to the multiprobe family: ``sized_sig_bits``
grows the signature ~ log2(n/64) while a FIXED n_flip=1 probes only
bits+1 buckets, so per-bucket collision decays geometrically and the
probe set can't keep up (measured: recall 0.385 at bits=5 on the
weakly clustered fixture). ``n_flip='auto'`` (resolve_n_flip:
clamp(ceil(bits/6), 2, 3)) is the measured-knee fix; this smoke
guards the auto pair (sig_bits auto, n_flip auto) against the same
0.45 floor, reusing the one brute-force pass all three legs share.

Usage: python tools/recall_smoke.py [sf_dir ...]
       (default: /root/testdata/sf0.1 and .scale/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 5
# measured at the auto dials: IVF 0.54/0.9998, LSH 0.73/0.96 (sf0.1 /
# sf1) — the sf0.1 fixture is weakly clustered, so it is the floor's
# binding side for both families.
FLOOR = 0.45


def recall_at(spark, sf_dir: str) -> dict:
    from listenbrainz_server_spark.catalog import load_table
    from listenbrainz_server_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_multiprobe_topk,
        resolve_n_centroids,
        resolve_n_flip,
        resolve_n_probe,
        sized_sig_bits,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    nlist = resolve_n_centroids("auto", emb)
    n_probe = resolve_n_probe("auto", nlist)
    sig_bits = sized_sig_bits(n)
    n_flip = resolve_n_flip("auto", sig_bits)
    t0 = time.time()
    exact = {
        (r.qid, r.nid)
        for r in brute_force_topk(emb, "vec_id", "embedding", k=K).collect()
    }
    t_exact = round(time.time() - t0, 1)
    t0 = time.time()
    approx = {
        (r.qid, r.nid)
        for r in ivf_topk(
            emb, "vec_id", "embedding", k=K, n_centroids="auto",
            n_probe="auto"
        ).collect()
    }
    t_ivf = round(time.time() - t0, 1)
    # IVFPQ at the full auto dial (nlist, n_probe, oversample): the
    # compressed-index serving form has a SECOND approximation layer
    # (residual byte codes + ADC re-rank through the oversample
    # window), so its recall needs its own guard at the dialed nlist.
    # The guard found the third dial leg: a FIXED oversample=8 read
    # 79% of IVF's recall at the sf0.1 auto pair (ADC noise grows
    # with the candidate pool); oversample='auto'=2*n_probe restores
    # >= 0.85x retention (see resolve_oversample).
    t0 = time.time()
    pq = {
        (r.qid, r.nid)
        for r in ivfpq_topk(
            emb, "vec_id", "embedding", dims=64, k=K, n_centroids="auto",
            n_probe="auto", m=8, k_sub=16, oversample="auto",
        ).collect()
    }
    t_pq = round(time.time() - t0, 1)
    # Sign-LSH leg (r13): the multiprobe serving dial — corpus-sized
    # signature + radius scaled with it. Reuses the exact set above.
    t0 = time.time()
    lsh = {
        (r.qid, r.nid)
        for r in lsh_multiprobe_topk(
            emb, "vec_id", "embedding", dims=64, k=K, sig_bits=None,
            n_flip="auto",
        ).collect()
    }
    t_lsh = round(time.time() - t0, 1)
    recall = round(len(exact & approx) / len(exact), 4)
    recall_pq = round(len(exact & pq) / len(exact), 4)
    recall_lsh = round(len(exact & lsh) / len(exact), 4)
    return {
        "n": n,
        "nlist_auto": nlist,
        "n_probe": n_probe,
        "k": K,
        "recall": recall,
        "exact_secs": t_exact,
        "ivf_secs": t_ivf,
        "recall_ivfpq": recall_pq,
        "ivfpq_secs": t_pq,
        "sig_bits_auto": sig_bits,
        "n_flip": n_flip,
        "recall_lsh": recall_lsh,
        "lsh_secs": t_lsh,
    }


def main() -> int:
    from listenbrainz_server_spark.session import get_session

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".scale/sf1"),
    ]
    spark = get_session("recall_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        results[label] = recall_at(spark, d)
        print(label, json.dumps(results[label]))
        spark.catalog.clearCache()

    path = os.path.join(REPO, "SCALING.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data.setdefault("auto_dial_recall", {}).update(results)
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)

    low = {k: v for k, v in results.items() if v["recall"] < FLOOR}
    lsh_low = {k: v for k, v in results.items() if v["recall_lsh"] < FLOOR}
    # IVFPQ's guard is RELATIVE to plain IVF at the same probe budget
    # (the test_ivfpq_topk_recall_and_ceiling discipline): the PQ
    # layer must retain >= 85% of the IVF recall — an absolute floor
    # would conflate the coarse-dial question (already guarded above)
    # with residual-quantization quality.
    pq_low = {
        k: v
        for k, v in results.items()
        if v["recall_ivfpq"] < 0.85 * v["recall"]
    }
    if low or pq_low or lsh_low:
        if low:
            print(f"RECALL SMOKE FAIL: below floor {FLOOR}: {low}")
        if pq_low:
            print(f"RECALL SMOKE FAIL: IVFPQ < 0.85x IVF recall: {pq_low}")
        if lsh_low:
            print(f"RECALL SMOKE FAIL: LSH auto dial below floor {FLOOR}: {lsh_low}")
        return 1
    print(f"RECALL SMOKE OK (floor {FLOOR}; IVFPQ >= 0.85x IVF; LSH leg)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
