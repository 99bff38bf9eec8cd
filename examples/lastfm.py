"""Related-artist and recommendation demo on the last.fm-360k dataset.

Workload parity with the reference's canonical demo
(/root/reference/examples/lastfm.py), rebuilt around this framework's
batched-by-construction serving: similar_items / recommend run in batched
device calls and results are written with vectorized label lookups.
Supports --synthetic for air-gapped environments.
"""

import argparse
import logging
import os
import sys
import time

import numpy as np
from tqdm.auto import tqdm

# allow running from a source checkout without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

log = logging.getLogger("implicit_tpu.examples")

BATCH = 1000
NEIGHBOURS = 11


def make_model(name, mesh=None):
    """Builds a model by name with hyperparameters tuned for this dataset."""
    import implicit_tpu
    from implicit_tpu import approximate_als, nearest_neighbours

    factories = {
        # mesh= also routes serving item-sharded across the chips
        "als": lambda: implicit_tpu.als.AlternatingLeastSquares(
            factors=128, dtype=np.float32, mesh=mesh
        ),
        "nmslib_als": lambda: approximate_als.NMSLibAlternatingLeastSquares(
            factors=128, dtype=np.float32
        ),
        "annoy_als": lambda: approximate_als.AnnoyAlternatingLeastSquares(
            factors=128, dtype=np.float32
        ),
        "faiss_als": lambda: approximate_als.FaissAlternatingLeastSquares(
            factors=128, dtype=np.float32
        ),
        "tpu_ivf_als": lambda: approximate_als.TPUIVFAlternatingLeastSquares(
            factors=128, dtype=np.float32
        ),
        "bpr": lambda: implicit_tpu.bpr.BayesianPersonalizedRanking(
            factors=63, mesh=mesh
        ),
        "lmf": lambda: implicit_tpu.lmf.LogisticMatrixFactorization(
            factors=30, iterations=40, regularization=1.5, mesh=mesh
        ),
        "cosine": nearest_neighbours.CosineRecommender,
        "tfidf": nearest_neighbours.TFIDFRecommender,
        "bm25": lambda: nearest_neighbours.BM25Recommender(K1=100, B=0.5),
    }
    try:
        return factories[name]()
    except KeyError:
        raise ValueError(f"Unknown model '{name}' (choose from {sorted(factories)})")


MODEL_NAMES = [
    "als", "nmslib_als", "annoy_als", "faiss_als", "tpu_ivf_als",
    "bpr", "lmf", "cosine", "tfidf", "bm25",
]


def load_data(synthetic=False):
    """Returns (artist labels, user labels, artist x user play counts)."""
    if synthetic:
        from implicit_tpu.datasets.synthetic import generate_synthetic

        plays = generate_synthetic(80_000, 30_000, 2_000_000).T.tocsr()
        artists = np.array([f"artist-{i}" for i in range(plays.shape[0])])
        users = np.array([f"user-{i}" for i in range(plays.shape[1])])
        return artists, users, plays

    from implicit_tpu.datasets.lastfm import get_lastfm

    return get_lastfm()


def train(model_name, plays, weight_for_als, mesh=None):
    """Weights the play counts if appropriate and fits the chosen model.

    Returns (model, user x artist likes) — ALS-family models train on
    BM25-weighted confidences (K1=100, B=0.8, the reference demo's setup).
    """
    from implicit_tpu.nearest_neighbours import bm25_weight

    model = make_model(model_name, mesh=mesh)
    if weight_for_als and model_name.endswith("als"):
        plays = bm25_weight(plays, K1=100, B=0.8).tocsr()
    user_plays = plays.T.tocsr()

    start = time.time()
    model.fit(user_plays)
    log.info("trained model '%s' in %.2fs", model_name, time.time() - start)
    return model, user_plays


def write_batch(out, query_labels, result_labels, ids, scores):
    """Appends one TSV row per (query, result) pair, skipping -1 padding."""
    for label, row_ids, row_scores in zip(query_labels, ids, scores):
        keep = row_ids >= 0
        lines = [
            f"{label}\t{other}\t{score}\n"
            for other, score in zip(result_labels[row_ids[keep]], row_scores[keep])
        ]
        out.writelines(lines)


def export_similar_artists(output_filename, model_name="als", synthetic=False, mesh=None):
    """TSV of the top similar artists for every artist, popular first."""
    artists, _, plays = load_data(synthetic)
    model, _ = train(model_name, plays, weight_for_als=True, mesh=mesh)
    if hasattr(model, "approximate_recommend"):
        model.approximate_recommend = False

    by_popularity = np.argsort(-np.diff(plays.indptr))

    chunks = [by_popularity[s : s + BATCH]
              for s in range(0, len(by_popularity), BATCH)]
    with open(output_filename, "w", encoding="utf8") as out:
        if hasattr(model, "similar_items_pipelined"):
            stream = model.similar_items_pipelined(chunks, NEIGHBOURS)
        else:
            stream = (model.similar_items(c, NEIGHBOURS) for c in chunks)
        for chunk, (ids, scores) in zip(tqdm(chunks), stream):
            write_batch(out, artists[chunk], artists, ids, scores)


def export_recommendations(output_filename, model_name="als", synthetic=False, mesh=None):
    """TSV of top-10 artist recommendations for every user."""
    artists, users, plays = load_data(synthetic)
    model, user_plays = train(model_name, plays, weight_for_als=True, mesh=mesh)
    if hasattr(model, "approximate_similar_items"):
        model.approximate_similar_items = False

    chunks = [np.arange(s, min(s + BATCH, len(users)))
              for s in range(0, len(users), BATCH)]
    with open(output_filename, "w", encoding="utf8") as out:
        if hasattr(model, "recommend_pipelined"):
            # streaming serving: TSV writing of one chunk overlaps the
            # device compute + transfers of the next
            stream = model.recommend_pipelined(
                ((c, user_plays[c]) for c in chunks))
        else:
            stream = (model.recommend(c, user_plays[c]) for c in chunks)
        for chunk, (ids, scores) in zip(tqdm(chunks), stream):
            write_batch(out, users[chunk], artists, ids, scores)


def main():
    parser = argparse.ArgumentParser(
        description="Generates similar artists or user recommendations on last.fm data"
    )
    parser.add_argument("--output", default="similar-artists.tsv")
    parser.add_argument("--model", default="als", choices=MODEL_NAMES)
    parser.add_argument("--recommend", action="store_true",
                        help="recommend artists per user instead of similar artists")
    parser.add_argument("--synthetic", action="store_true",
                        help="use synthetic data (no download)")
    parser.add_argument("--mesh", type=int, default=None, metavar="N",
                        help="train and serve als/bpr/lmf across an N-device mesh")
    args = parser.parse_args()

    logging.basicConfig(level=logging.DEBUG)
    run = export_recommendations if args.recommend else export_similar_artists
    run(args.output, model_name=args.model, synthetic=args.synthetic,
        mesh=args.mesh)


if __name__ == "__main__":
    main()
