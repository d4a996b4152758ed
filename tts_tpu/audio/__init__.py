from .processor import AudioProcessor, StandardScaler  # noqa: F401
from . import numpy_transforms  # noqa: F401
from . import jax_transforms  # noqa: F401
from .mel import mel_filterbank, build_mel_basis  # noqa: F401
