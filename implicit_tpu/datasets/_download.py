"""Download helper with a local cache directory and a progress bar."""

import os
from urllib.request import urlretrieve

from tqdm.auto import tqdm

LOCAL_CACHE_DIR = os.path.join(os.path.expanduser("~"), "implicit_datasets")


def download_file(url, local_filename):
    """urlretrieve with a tqdm progress bar, creating the target directory."""
    local_filename = os.path.abspath(local_filename)
    path = os.path.dirname(local_filename)
    if not os.path.isdir(path):
        os.makedirs(path)

    with tqdm(unit="B", unit_scale=True) as progress:

        def report(chunk, chunksize, total):
            progress.total = total
            progress.update(chunksize)

        return urlretrieve(url, local_filename, reporthook=report)


def fetch_cached(url, filename):
    """Returns the local path of ``filename``, downloading from ``url`` if absent."""
    local = os.path.join(LOCAL_CACHE_DIR, filename)
    if not os.path.isfile(local):
        download_file(url, local)
    return local
