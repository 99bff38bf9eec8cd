"""Dataset loaders: cached HDF5 downloads of standard implicit-feedback sets.

Mirrors /root/reference/implicit/datasets/: lastfm-360k, MovieLens
(100k/1m/10m/20m), the Million Song Dataset, reddit and sketchfab, each
exposing a ``get_*()`` returning (labels..., csr_matrix), plus
``generate_dataset`` converters from the raw dumps. A ``synthetic`` module is
added for benchmarking in air-gapped environments.
"""
