from qaray_tpu.core import constants
from qaray_tpu.core.vecmath import (
    dot,
    cross,
    normalize,
    length,
    luma,
)
