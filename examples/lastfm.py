"""Related-artist and recommendation demo on the last.fm-360k dataset.

TPU-native analogue of /root/reference/examples/lastfm.py: trains any of the
framework's models on last.fm play counts (downloaded automatically, or
synthetic with --synthetic in air-gapped environments) and writes out
similar-artist lists or per-user recommendations.
"""

import argparse
import codecs
import logging
import time

import numpy as np
import tqdm

from implicit_tpu.als import AlternatingLeastSquares
from implicit_tpu.approximate_als import (
    AnnoyAlternatingLeastSquares,
    FaissAlternatingLeastSquares,
    NMSLibAlternatingLeastSquares,
)
from implicit_tpu.bpr import BayesianPersonalizedRanking
from implicit_tpu.lmf import LogisticMatrixFactorization
from implicit_tpu.nearest_neighbours import (
    BM25Recommender,
    CosineRecommender,
    TFIDFRecommender,
    bm25_weight,
)

log = logging.getLogger("implicit_tpu.examples")

MODELS = {
    "als": AlternatingLeastSquares,
    "nmslib_als": NMSLibAlternatingLeastSquares,
    "annoy_als": AnnoyAlternatingLeastSquares,
    "faiss_als": FaissAlternatingLeastSquares,
    "tfidf": TFIDFRecommender,
    "cosine": CosineRecommender,
    "bpr": BayesianPersonalizedRanking,
    "lmf": LogisticMatrixFactorization,
    "bm25": BM25Recommender,
}


def get_model(model_name):
    model_class = MODELS.get(model_name)
    if not model_class:
        raise ValueError(f"Unknown Model '{model_name}'")

    if model_name.endswith("als"):
        params = {"factors": 128, "dtype": np.float32}
    elif model_name == "bm25":
        params = {"K1": 100, "B": 0.5}
    elif model_name == "bpr":
        params = {"factors": 63}
    elif model_name == "lmf":
        params = {"factors": 30, "iterations": 40, "regularization": 1.5}
    else:
        params = {}
    return model_class(**params)


def load_data(synthetic=False):
    if synthetic:
        from implicit_tpu.datasets.synthetic import generate_synthetic

        plays = generate_synthetic(80_000, 30_000, 2_000_000).T.tocsr()
        artists = np.array([f"artist-{i}" for i in range(plays.shape[0])])
        users = np.array([f"user-{i}" for i in range(plays.shape[1])])
        return artists, users, plays

    from implicit_tpu.datasets.lastfm import get_lastfm

    return get_lastfm()


def calculate_similar_artists(output_filename, model_name="als", synthetic=False):
    """Writes a TSV of (artist, similar artist, score) for every artist."""
    artists, _, plays = load_data(synthetic)
    model = get_model(model_name)

    if model_name.endswith("als"):
        plays = bm25_weight(plays, K1=100, B=0.8)
        model.approximate_recommend = False

    plays = plays.tocsr()
    user_plays = plays.T.tocsr()

    start = time.time()
    model.fit(user_plays)
    log.info("trained model '%s' in %.2fs", model_name, time.time() - start)

    user_count = np.ediff1d(plays.indptr)
    to_generate = sorted(np.arange(len(artists)), key=lambda x: -user_count[x])

    with tqdm.tqdm(total=len(to_generate)) as progress, codecs.open(
        output_filename, "w", "utf8"
    ) as o:
        batch_size = 1000
        for startidx in range(0, len(to_generate), batch_size):
            batch = to_generate[startidx : startidx + batch_size]
            ids, scores = model.similar_items(batch, 11)
            for i, artistid in enumerate(batch):
                artist = artists[artistid]
                for other, score in zip(ids[i], scores[i]):
                    o.write(f"{artist}\t{artists[other]}\t{score}\n")
            progress.update(len(batch))


def calculate_recommendations(output_filename, model_name="als", synthetic=False):
    """Writes a TSV of (user, artist, score) recommendations for every user."""
    artists, users, plays = load_data(synthetic)
    model = get_model(model_name)

    if model_name.endswith("als"):
        plays = bm25_weight(plays, K1=100, B=0.8)
        model.approximate_similar_items = False

    plays = plays.tocsr()
    user_plays = plays.T.tocsr()

    start = time.time()
    model.fit(user_plays)
    log.info("trained model '%s' in %.2fs", model_name, time.time() - start)

    with tqdm.tqdm(total=len(users)) as progress, codecs.open(
        output_filename, "w", "utf8"
    ) as o:
        batch_size = 1000
        for startidx in range(0, len(users), batch_size):
            batch = np.arange(startidx, min(startidx + batch_size, len(users)))
            ids, scores = model.recommend(batch, user_plays[batch])
            for i, userid in enumerate(batch):
                username = users[userid]
                for other, score in zip(ids[i], scores[i]):
                    o.write(f"{username}\t{artists[other]}\t{score}\n")
            progress.update(len(batch))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Generates similar artists or recommendations on last.fm data"
    )
    parser.add_argument("--output", type=str, default="similar-artists.tsv")
    parser.add_argument("--model", type=str, default="als", choices=MODELS)
    parser.add_argument(
        "--recommend", action="store_true", help="recommend for users instead"
    )
    parser.add_argument(
        "--synthetic", action="store_true", help="use synthetic data (no download)"
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.DEBUG)
    if args.recommend:
        calculate_recommendations(args.output, model_name=args.model, synthetic=args.synthetic)
    else:
        calculate_similar_artists(args.output, model_name=args.model, synthetic=args.synthetic)
