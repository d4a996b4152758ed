from .config import Tacotron2Config, TacotronConfig  # noqa: F401
from .model import Tacotron2, Tacotron2Module, tacotron_loss  # noqa: F401
