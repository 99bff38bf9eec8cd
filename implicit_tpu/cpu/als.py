"""Alias of /root/reference/implicit/cpu/als.py's public class.

The unified TPU-native model accepts the reference CPU class's full
constructor signature (factors, regularization, alpha, dtype, use_native,
use_cg, iterations, calculate_training_loss, num_threads, random_state)
plus the TPU-specific ``mesh``/``grid`` knobs.
"""

from ..models.als import (  # noqa: F401
    AlternatingLeastSquares,
    calculate_loss,
    item_factor,
    least_squares,
    least_squares_cg,
    user_factor,
    user_linear_equation,
)
