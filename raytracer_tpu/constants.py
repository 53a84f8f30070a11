"""Shared numeric constants.

The reference uses f32 everywhere with a single epsilon 1e-4
(/root/reference/src/tuples.rs:4-8, src/intersections.rs:119). We keep the
same epsilon so shadow-acne offsets (over/under points), parallel-ray guards
and cap bands produce matching geometry.
"""

EPSILON = 1e-4

# Value used by the reference for "no t / miss" ordering; we use +inf padding
# in the candidate-hit tables instead, this is the sentinel written to u/v of
# non-triangle intersections (src/intersections.rs:33-40 uses f32::MAX).
UV_NONE = 3.4028235e38

# Default reflection/refraction recursion limit (src/world.rs:38).
RECURSION_LIMIT = 4
