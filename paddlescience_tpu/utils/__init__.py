from paddlescience_tpu.utils import initializer, logger, misc  # noqa: F401
from paddlescience_tpu.utils.misc import AverageMeter, Timer, set_random_seed  # noqa: F401
from paddlescience_tpu.utils.symbolic import lambdify  # noqa: F401
