"""Similar-movie demo on the MovieLens datasets.

TPU-native analogue of /root/reference/examples/movielens.py: the explicit
5-star ratings are binarized at a minimum rating (default 4.0) to form an
implicit dataset, then any of the framework's models computes similar movies.
"""

import argparse
import codecs
import logging
import time

import numpy as np
import tqdm

from implicit_tpu.als import AlternatingLeastSquares
from implicit_tpu.bpr import BayesianPersonalizedRanking
from implicit_tpu.lmf import LogisticMatrixFactorization
from implicit_tpu.nearest_neighbours import (
    BM25Recommender,
    CosineRecommender,
    TFIDFRecommender,
    bm25_weight,
)

log = logging.getLogger("implicit_tpu.examples")


def calculate_similar_movies(output_filename, model_name="als", min_rating=4.0, variant="20m"):
    from implicit_tpu.datasets.movielens import get_movielens

    start = time.time()
    titles, ratings = get_movielens(variant)

    # binarize: keep only positive (>= min_rating) reviews as implicit likes
    ratings.data[ratings.data < min_rating] = 0
    ratings.eliminate_zeros()
    ratings.data = np.ones(len(ratings.data))
    log.info("read data file in %.2fs", time.time() - start)

    factories = {
        "als": AlternatingLeastSquares,
        "bpr": BayesianPersonalizedRanking,
        "lmf": LogisticMatrixFactorization,
        "tfidf": TFIDFRecommender,
        "cosine": CosineRecommender,
        "bm25": lambda: BM25Recommender(B=0.2),
    }
    if model_name not in factories:
        raise NotImplementedError(f"model {model_name} isn't implemented for this example")
    model = factories[model_name]()

    if model_name == "als":
        # ALS benefits from confidence weighting of the binary signals
        ratings = (bm25_weight(ratings, B=0.9) * 5).tocsr()

    user_ratings = ratings.T.tocsr()

    start = time.time()
    model.fit(user_ratings)
    log.info("trained model '%s' in %.2fs", model_name, time.time() - start)

    # popular movies first
    user_count = np.ediff1d(ratings.indptr)
    to_generate = sorted(np.arange(len(titles)), key=lambda x: -user_count[x])

    with tqdm.tqdm(total=len(to_generate)) as progress, codecs.open(
        output_filename, "w", "utf8"
    ) as o:
        batch_size = 1000
        for startidx in range(0, len(to_generate), batch_size):
            batch = to_generate[startidx : startidx + batch_size]
            ids, scores = model.similar_items(batch, 11)
            for i, movieid in enumerate(batch):
                if ratings.indptr[movieid] == ratings.indptr[movieid + 1]:
                    continue
                title = titles[movieid]
                for other, score in zip(ids[i], scores[i]):
                    o.write(f"{title}\t{titles[other]}\t{score}\n")
            progress.update(len(batch))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Generates similar movies on MovieLens")
    parser.add_argument("--output", type=str, default="similar-movies.tsv")
    parser.add_argument(
        "--model", type=str, default="als",
        choices=["als", "bpr", "lmf", "tfidf", "cosine", "bm25"],
    )
    parser.add_argument("--variant", type=str, default="20m",
                        choices=["100k", "1m", "10m", "20m"])
    parser.add_argument("--min_rating", type=float, default=4.0)
    args = parser.parse_args()

    logging.basicConfig(level=logging.DEBUG)
    calculate_similar_movies(
        args.output, model_name=args.model, min_rating=args.min_rating, variant=args.variant
    )
