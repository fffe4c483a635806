from .scalar import (  # noqa: F401
    clip,
    cents,
    make_id,
    parse_feet_inches,
    wrap_angle_deg,
    dummy,
)
from .portable import portable_hash_expr, knuth_fold_expr  # noqa: F401
