"""Similar-movie demo on the MovieLens datasets.

Workload parity with /root/reference/examples/movielens.py: the explicit
5-star ratings are binarized at a minimum rating (default 4.0) into an
implicit dataset, then any of the framework's models computes similar
movies via batched device serving.
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


def make_model(name):
    import implicit_tpu
    from implicit_tpu import ease, nearest_neighbours

    factories = {
        "als": implicit_tpu.als.AlternatingLeastSquares,
        "bpr": implicit_tpu.bpr.BayesianPersonalizedRanking,
        "lmf": implicit_tpu.lmf.LogisticMatrixFactorization,
        "cosine": nearest_neighbours.CosineRecommender,
        "tfidf": nearest_neighbours.TFIDFRecommender,
        "bm25": lambda: nearest_neighbours.BM25Recommender(B=0.2),
        # closed-form EASE fits movielens-scale catalogs (<=32k items)
        "ease": lambda: ease.EASERecommender(K=100, regularization=250.0),
    }
    try:
        return factories[name]()
    except KeyError:
        raise NotImplementedError(f"model {name} isn't implemented for this example")


def binarize(ratings, min_rating):
    """Keeps only reviews of at least ``min_rating``, as unit-weight likes."""
    ratings.data[ratings.data < min_rating] = 0
    ratings.eliminate_zeros()
    ratings.data[:] = 1.0
    return ratings


def export_similar_movies(output_filename, model_name="als", min_rating=4.0, variant="20m",
                          synthetic=False):
    from implicit_tpu.datasets.movielens import get_movielens
    from implicit_tpu.nearest_neighbours import bm25_weight

    start = time.time()
    if synthetic:
        # air-gapped environments: a MovieLens-shaped synthetic ratings matrix
        from implicit_tpu.datasets.synthetic import generate_synthetic

        plays = generate_synthetic(5000, 2000, 100_000, seed=3)
        ratings = plays.T.tocsr()
        ratings.data = (ratings.data.astype(np.int64) % 5 + 1).astype(np.float32)
        titles = np.array([f"movie-{i}" for i in range(ratings.shape[0])])
    else:
        titles, ratings = get_movielens(variant)
    ratings = binarize(ratings, min_rating)
    log.info("read data file in %.2fs", time.time() - start)

    model = make_model(model_name)
    if model_name == "als":
        # confidence-weight the binary likes for the implicit-ALS objective
        ratings = (bm25_weight(ratings, B=0.9) * 5).tocsr()

    user_ratings = ratings.T.tocsr()
    start = time.time()
    model.fit(user_ratings)
    log.info("trained model '%s' in %.2fs", model_name, time.time() - start)

    rated_count = np.diff(ratings.indptr)
    by_popularity = np.argsort(-rated_count)

    with open(output_filename, "w", encoding="utf8") as out:
        for batch_start in tqdm(range(0, len(by_popularity), BATCH)):
            chunk = by_popularity[batch_start : batch_start + BATCH]
            ids, scores = model.similar_items(chunk, NEIGHBOURS)
            for movieid, row_ids, row_scores in zip(chunk, ids, scores):
                if rated_count[movieid] == 0:
                    continue  # unrated movies have nothing meaningful to report
                keep = row_ids >= 0
                out.writelines(
                    f"{titles[movieid]}\t{other}\t{score}\n"
                    for other, score in zip(titles[row_ids[keep]], row_scores[keep])
                )


def main():
    parser = argparse.ArgumentParser(description="Generates similar movies on MovieLens")
    parser.add_argument("--output", default="similar-movies.tsv")
    parser.add_argument("--model", default="als",
                        choices=["als", "bpr", "lmf", "tfidf", "cosine", "bm25",
                                 "ease"])
    parser.add_argument("--variant", default="20m", choices=["100k", "1m", "10m", "20m"])
    parser.add_argument("--min_rating", type=float, default=4.0)
    parser.add_argument("--synthetic", action="store_true",
                        help="use a synthetic ratings matrix (no download)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.DEBUG)
    export_similar_movies(
        args.output, model_name=args.model, min_rating=args.min_rating,
        variant=args.variant, synthetic=args.synthetic
    )


if __name__ == "__main__":
    main()
