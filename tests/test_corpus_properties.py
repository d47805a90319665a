"""Property sweeps for the round-4 corpus operators: seeded random
corpora checked against pure-Python reference implementations (the
hypothesis style of `test_properties.py`, but with one Spark session
reused across deterministic seeds — Spark calls inside @given would
re-run the session fixture per example)."""

from __future__ import annotations

import random


from dig_etl_engine_spark.operators.text_analysis import (
    global_line_dedup, remove_contaminated_spans, repeated_window_flags)

WORDS = ["alpha", "beta", "gamma", "delta", "rho", "tau", "mu", "pi"]


def _rand_docs(rng, n_docs, n_lines, n_words, sep):
    docs = []
    for i in range(n_docs):
        lines = [" ".join(rng.choices(WORDS, k=rng.randint(1, n_words)))
                 for _ in range(rng.randint(1, n_lines))]
        docs.append((i, sep.join(lines)))
    return docs


class TestGlobalLineDedupProperties:
    def _reference(self, docs, sep, keep_first):
        """Pure-Python replay of the C4 rule."""
        first = {}
        counts = {}
        for did, text in sorted(docs):
            for pos, line in enumerate(text.split(sep)):
                if line.strip() == "":
                    continue
                counts[line] = counts.get(line, 0) + 1
                first.setdefault(line, (did, pos))
        out = {}
        for did, text in docs:
            kept = []
            for pos, line in enumerate(text.split(sep)):
                if line.strip() == "":
                    kept.append(line)
                elif keep_first and first[line] == (did, pos):
                    kept.append(line)
                elif not keep_first and counts[line] == 1:
                    kept.append(line)
            out[did] = sep.join(kept)
        return out

    def test_matches_reference_over_seeded_corpora(self, spark):
        for seed in range(6):
            rng = random.Random(seed)
            sep = "\n" if seed % 2 == 0 else "\n\n"
            keep_first = seed % 3 != 0
            docs = _rand_docs(rng, n_docs=8, n_lines=5, n_words=3,
                              sep=sep)
            # plant cross-doc duplicates aggressively
            docs = [(d, t if rng.random() < 0.5 else
                     t + sep + "shared line") for d, t in docs]
            df = spark.createDataFrame(docs, "doc_id long, text string")
            got = {r.doc_id: r.text
                   for r in global_line_dedup(
                       df, sep=sep, keep_first=keep_first).collect()}
            assert got == self._reference(docs, sep, keep_first), (
                seed, sep, keep_first)


class TestSpanDecontaminationProperties:
    @staticmethod
    def _reference(docs, evals, n):
        """Pure-Python replay: covered = union of [i, i+n) spans of
        n-grams (whole-doc fallback for short docs) present in the eval
        gram set; survivors keep original case and order."""
        def grams(toks):
            n_out = max(len(toks) - (n - 1), 1)
            return [(i, " ".join(toks[i:i + n])) for i in range(n_out)]

        eval_grams = {g for _, t in evals for _, g in grams(t.lower().split())}
        out = {}
        for did, text in docs:
            toks = text.split()
            low = [t.lower() for t in toks]
            covered = set()
            for i, g in grams(low):
                if g in eval_grams:
                    covered.update(range(i, min(i + n, len(toks))))
            kept = [t for j, t in enumerate(toks) if j not in covered]
            out[did] = (" ".join(kept), len(covered))
        return out

    def test_matches_reference_over_seeded_corpora(self, spark):
        for seed in range(4):
            rng = random.Random(100 + seed)
            docs = [(i, " ".join(rng.choices(WORDS, k=rng.randint(3, 30))))
                    for i in range(10)]
            evals = [(900 + i, " ".join(rng.choices(WORDS, k=6)))
                     for i in range(3)]
            # plant a verbatim leak so coverage is non-trivial
            docs.append((50, docs[0][1] + " " + evals[0][1]))
            ddf = spark.createDataFrame(docs, "doc_id long, text string")
            edf = spark.createDataFrame(evals, "doc_id long, text string")
            got = {r.doc_id: (r.text, r.n_removed)
                   for r in remove_contaminated_spans(
                       ddf, edf, n=4).collect()}
            assert got == self._reference(docs, evals, 4), seed


class TestRepeatedWindowProperties:
    def test_matches_reference_counts(self, spark):
        for seed in range(4):
            rng = random.Random(200 + seed)
            docs = [(i, " ".join(rng.choices(WORDS, k=rng.randint(3, 20))))
                    for i in range(12)]
            df = spark.createDataFrame(docs, "doc_id long, text string")
            got = {r.doc_id: (r.n_windows, r.n_repeated)
                   for r in repeated_window_flags(df, w=3).collect()}
            # reference: all 3-token windows corpus-wide
            wins = {}
            per_doc = {}
            for did, text in docs:
                toks = text.lower().split()
                n_out = max(len(toks) - 2, 1)
                ws = [" ".join(toks[i:i + 3]) for i in range(n_out)]
                per_doc[did] = ws
                for w_ in ws:
                    wins[w_] = wins.get(w_, 0) + 1
            for did, ws in per_doc.items():
                n_rep = sum(1 for w_ in ws if wins[w_] > 1)
                assert got[did] == (len(ws), n_rep), (seed, did)
