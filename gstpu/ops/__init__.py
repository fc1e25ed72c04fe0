from gstpu.ops.preprocess import preprocess  # noqa: F401
from gstpu.ops.binning import build_pairs  # noqa: F401
