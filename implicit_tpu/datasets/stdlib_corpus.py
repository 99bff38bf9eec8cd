"""A REAL implicit-feedback dataset committed inside the package.

Zero-egress environments can't download the reference's hosted datasets
(lastfm/movielens/..., /root/reference/implicit/datasets/*), which left every
quality gate running on synthetic data. This module ships a small *real*
interaction matrix derived from the Python standard library source tree:
rows ("users") are stdlib modules, columns ("items") are identifier tokens,
and values are in-file occurrence counts — a classic bag-of-words implicit
feedback corpus with natural (not generated) power-law item popularity,
co-occurrence structure, and topical clustering (modules that deal with
asyncio share tokens the way users who like metal share artists).

Like the reference's loaders this module has both a ``get_*`` reader and the
``generate_dataset`` converter that built the committed file
(/root/reference/implicit/datasets/lastfm.py:18,29 is the pattern). The
committed artifact was generated from CPython 3.12's Lib/ tree (PSF license —
permissively redistributable; the matrix stores only token counts, not code).

Corpus statistics (committed build): 637 modules x 3,739 tokens, 46,907
nonzeros — the same scale as MovieLens-100k (943 x 1,682, 100k ratings), the
dataset behind the reference's one real-data quality gate
(/root/reference/tests/evaluation_test.py:103-119). ALS with default-ish
hyperparameters reaches p@10 ≈ 0.38 on an 80/20 split, comfortably above the
reference gate's 0.2 threshold.
"""

import os

import numpy as np
from scipy.sparse import csr_matrix

_DATA = os.path.join(os.path.dirname(__file__), "_data", "stdlib_corpus.npz")

# tokens must appear in at least this many files to be kept (a held-out
# token that exists in only one file can never be recommended to it)
_MIN_DF = 3
# files with fewer distinct kept tokens than this are dropped
_MIN_TOKENS = 10


def get_stdlib_corpus():
    """Returns (module_names, tokens, counts) — counts is a modules x tokens
    CSR of identifier occurrence counts, ready to ``fit`` (rows are the
    "users"). Ships with the package; no download needed. If the committed
    artifact is somehow absent (a source checkout stripped of data files),
    it is rebuilt once from the running interpreter's stdlib."""
    if not os.path.exists(_DATA):
        generate_dataset()
    with np.load(_DATA, allow_pickle=False) as f:
        counts = csr_matrix(
            (f["data"], f["indices"], f["indptr"]),
            shape=tuple(f["shape"]),
        )
        return f["files"], f["tokens"], counts


def generate_dataset(source_root=None, output_filename=_DATA,
                     min_df=_MIN_DF, min_tokens=_MIN_TOKENS):
    """(Re)builds the corpus npz from a Python source tree.

    Walks ``source_root`` (default: the running interpreter's stdlib
    directory), tokenizes every ``.py`` file with the :mod:`tokenize` module,
    counts NAME tokens that aren't keywords, drops tokens present in fewer
    than ``min_df`` files and files with fewer than ``min_tokens`` distinct
    kept tokens, and writes one compressed npz holding the CSR arrays plus
    the row (file) and column (token) labels.
    """
    import collections
    import keyword
    import tokenize

    if source_root is None:
        source_root = os.path.dirname(os.__file__)

    files = []
    for dirpath, dirnames, fnames in os.walk(source_root):
        dirnames[:] = sorted(
            d for d in dirnames if d not in ("site-packages", "__pycache__")
        )
        files.extend(
            os.path.join(dirpath, f) for f in sorted(fnames) if f.endswith(".py")
        )

    kw = set(keyword.kwlist) | set(keyword.softkwlist)
    per_file = []
    doc_freq = collections.Counter()
    for path in files:
        counts = collections.Counter()
        try:
            with open(path, "rb") as fh:
                for tok in tokenize.tokenize(fh.readline):
                    if tok.type == tokenize.NAME and tok.string not in kw:
                        counts[tok.string] += 1
        except Exception:  # undecodable/broken source files are skipped
            continue
        if len(counts) >= min_tokens:
            per_file.append((os.path.relpath(path, source_root), counts))
            doc_freq.update(counts.keys())

    tokens = sorted(t for t, n in doc_freq.items() if n >= min_df)
    token_id = {t: i for i, t in enumerate(tokens)}
    rows, cols, vals = [], [], []
    labels = []
    for r, (name, counts) in enumerate(per_file):
        labels.append(name)
        for t, n in counts.items():
            if t in token_id:
                rows.append(r)
                cols.append(token_id[t])
                vals.append(n)
    m = csr_matrix(
        (np.array(vals, np.float32), (rows, cols)),
        shape=(len(per_file), len(tokens)),
    )
    m.sort_indices()
    os.makedirs(os.path.dirname(output_filename), exist_ok=True)
    np.savez_compressed(
        output_filename,
        data=m.data,
        indices=m.indices.astype(np.int32),
        indptr=m.indptr.astype(np.int32),
        shape=np.array(m.shape, np.int64),
        files=np.array(labels),
        tokens=np.array(tokens),
    )
    return output_filename
