"""Dataset loaders: cached HDF5 downloads of standard implicit-feedback sets.

Mirrors /root/reference/implicit/datasets/: lastfm-360k, MovieLens
(100k/1m/10m/20m), the Million Song Dataset, reddit and sketchfab, each
exposing a ``get_*()`` returning (labels..., csr_matrix), plus
``generate_dataset`` converters from the raw dumps. Two additions beyond the
reference: a ``synthetic`` module for benchmarking in air-gapped environments,
and ``stdlib_corpus`` — a small REAL interaction matrix committed inside the
package (no download) so quality gates can run on non-synthetic data anywhere.
"""
