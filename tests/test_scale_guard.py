"""Scale-smell guard: driver-side materialization (`take_all`,
`iter_rows`) is only allowed at sites that are PROVABLY bounded —
dimension tables, filtered query rows, per-block partial folds, or an
explicitly size-gated broadcast branch whose scale path exists beside
it. Any new occurrence fails this test until it is reviewed and either
redesigned or added here with its bound."""

import ast
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "webxtract"

# (module path relative to webxtract/, enclosing function) -> bound
ALLOWED = {
    ("ops/relational.py", "q22_idle_customers"): "single global-average scalar",
    ("ops/dedup.py", "minhash_lsh_pairs"): "broadcast verify branch only; join path is the scale default via _resolve_verify",
    ("ops/dedup.py", "simhash_pairs"): "broadcast verify branch only; join path is the scale default",
    ("ops/dedup.py", "ngram_jaccard_pairs"): "exact all-pairs baseline, O(n^2) by declared intent; hard-gated to NGRAM_JACCARD_MAX_DOCS (raises above)",
    ("ops/knn.py", "_fetch_queries"): "row-filtered to len(query_ids) rows",
    ("ops/knn.py", "label_centroids"): "|labels| x batches partial rows (sum-vector + count)",
    ("ops/knn.py", "_kmeans_seeds"): "k seed rows",
    ("ops/retrieval.py", "_pad_zero_docs"):
        "top-k result rows only (<= k, post-limit) plus a <= k "
        "doc-id pad from the sorted length table",
    ("ops/text.py", "docs_langid_ngram"):
        "|langs| x blocks lang-count partials + single-row-per-block "
        "vocab totals (the weight table itself is gated: broadcast "
        "under VOCAB_BROADCAST_MAX_TERMS, copartitioned join above)",
    ("ops/web.py", "domain_blocklist"):
        "broadcast branch only, |distinct blocklist| rows gated at "
        "DOMAIN_BLOCKLIST_BROADCAST_MAX; join twin is the scale path "
        "(broadcast == join pinned in test_web3.py)",
}


def _sites():
    out = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        rel = str(path.relative_to(PKG))
        func_ranges = []
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                func_ranges.append(
                    (node.lineno, node.end_lineno, node.name))
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr in ("take_all", "iter_rows")):
                fn = "<module>"
                best = None
                for lo, hi, name in func_ranges:
                    if lo <= node.lineno <= hi and (
                            best is None or lo > best[0]):
                        best = (lo, name)
                if best:
                    fn = best[1]
                out.append((rel, fn, node.lineno))
    return out


def test_driver_materialization_allowlist():
    found = _sites()
    extra = [(m, f, ln) for m, f, ln in found if (m, f) not in ALLOWED]
    assert not extra, (
        "unreviewed driver-side materialization site(s): "
        f"{extra} — take_all/iter_rows on unbounded data does not "
        "survive 100 TB; redesign or add to ALLOWED with its bound")


def test_allowlist_is_not_stale():
    live = {(m, f) for m, f, _ in _sites()}
    stale = [k for k in ALLOWED if k not in live]
    assert not stale, f"ALLOWED entries no longer present: {stale}"
