"""Train the committed fastText-style quality-classifier weights.

DCLM/fastText-style model-based quality filtering distills an expensive
quality signal into a tiny linear model over hashed n-gram features that
scores at full-corpus speed. Here the teacher signal is the repo's own
heuristic ``quality_score`` (analytics/text.py:quality_exprs) median-split
on the sf0.01 testdata; the student is logistic regression over
NBUCKETS-bucket hashed unigram+bigram mean counts.

Everything is deterministic (fixed init, fixed full-batch GD schedule, no
RNG), so re-running this tool reproduces
``pdf_parser_spark/analytics/quality_weights.txt`` byte-identically.
Weights are committed as INTEGER micro-units (w * 1e6 rounded): scoring
then sums exact int64s — order-free, bit-identical across Spark and
DuckDB (a float weight sum would depend on list order in both engines).

Usage: python tools/train_quality_clf.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import re
import sys
from pathlib import Path

import duckdb
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark.analytics.classifier import NBUCKETS  # noqa: E402

EN_STOP = ["the", "and", "of", "to", "is"]  # LANG_MARKERS["en"]


def bucket(feat: str) -> int:
    """Same hash as Spark _md5_int(feat) % NBUCKETS / the DuckDB oracle."""
    return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % NBUCKETS


def quality_score(text: str) -> float:
    """Python mirror of quality_exprs' composite score (teacher label)."""
    toks = re.split(r"\s+", text.strip())
    n_tokens = len(toks)
    n_chars = len(text)
    stop_hits = sum(1 for t in toks if t in EN_STOP)
    punct = n_chars - len(re.sub(r"[^\w\s]", "", text, flags=re.ASCII))
    return (min(n_tokens / 100.0, 1.0) * 0.4
            + min(stop_hits / max(n_tokens, 1) * 10.0, 1.0) * 0.3
            + (1.0 - min(punct / max(n_chars, 1) * 5.0, 1.0)) * 0.3)


def features(text: str) -> np.ndarray:
    from pdf_parser_spark.analytics.classifier import py_features

    feats = py_features(text)  # tokens + bigrams + pseudo-tokens
    x = np.zeros(NBUCKETS)
    for f in feats:
        x[bucket(f)] += 1.0
    return x / len(feats)  # mean-of-embeddings, fastText-style


def evaluate(train_sf_dir: str = "/root/testdata/sf0.01",
             eval_sf_dir: str = "/root/testdata/sf0.1",
             holdout_from: int = 500) -> dict:
    """Held-out precision/recall of the COMMITTED weights vs the
    teacher (r4 verdict item 9): eval docs are sf0.1 ids >=
    ``holdout_from`` — disjoint from the sf0.01 training ids (0-499) —
    labeled with the TRAINING corpus's median threshold (the split the
    student was trained to imitate). Deterministic end to end, so the
    committed quality_clf_eval.json regenerates byte-identically and a
    weight-table regression now fails SEMANTICALLY (metric floor in
    tests/test_analytics.py), not just bit-wise."""
    from pdf_parser_spark.analytics.classifier import load_weights

    bias, wi = load_weights()
    w = np.array(wi) / 1e6
    b = bias / 1e6
    train = duckdb.sql(
        f"SELECT text FROM read_parquet('{train_sf_dir}/"
        "documents.parquet') ORDER BY doc_id").fetchall()
    thr = float(np.median([quality_score(t) for (t,) in train]))
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{eval_sf_dir}/"
        f"documents.parquet') WHERE doc_id >= {holdout_from} "
        "ORDER BY doc_id").fetchall()
    y = np.array([quality_score(t) >= thr for _, t in rows])
    X = np.stack([features(t) for _, t in rows])
    pred = X @ w + b > 0
    tp = int((pred & y).sum())
    fp = int((pred & ~y).sum())
    fn = int((~pred & y).sum())
    tn = int((~pred & ~y).sum())
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    return {
        "n_eval": len(y), "holdout_from": holdout_from,
        "teacher_threshold": round(thr, 6),
        "base_rate": round(float(y.mean()), 6),
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": round(prec, 6), "recall": round(rec, 6),
        "accuracy": round((tp + tn) / len(y), 6),
        "f1": round(2 * prec * rec / (prec + rec), 6),
    }


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id").fetchall()
    scores = np.array([quality_score(t) for _, t in rows])
    y = (scores >= np.median(scores)).astype(np.float64)
    X = np.stack([features(t) for _, t in rows])

    w = np.zeros(NBUCKETS)
    b = 0.0
    lr, l2 = 1.0, 1e-3
    for _ in range(500):  # fixed schedule -> deterministic weights
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(y) + l2 * w)
        b -= lr * float(g.mean())

    acc = float(((X @ w + b > 0) == (y > 0.5)).mean())
    out = Path(__file__).resolve().parent.parent / "pdf_parser_spark" / \
        "analytics" / "quality_weights.txt"
    lines = [str(int(round(b * 1e6)))]
    lines += [str(int(round(x * 1e6))) for x in w]
    out.write_text("\n".join(lines) + "\n")
    print(f"trained on {len(y)} docs, train acc {acc:.3f}, wrote {out}")

    import json

    ev = evaluate(train_sf_dir=sf_dir)
    ev_path = out.with_name("quality_clf_eval.json")
    ev_path.write_text(json.dumps(ev, indent=1, sort_keys=True) + "\n")
    print(f"held-out eval ({ev['n_eval']} docs): "
          f"precision {ev['precision']:.3f} recall {ev['recall']:.3f} "
          f"(base rate {ev['base_rate']:.3f}), wrote {ev_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
