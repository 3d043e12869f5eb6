from paddlescience_tpu.utils import (  # noqa: F401
    config,
    ema,
    initializer,
    logger,
    misc,
    reader,
    save_load,
    writer,
)
from paddlescience_tpu.utils.checker import dynamic_import_to_globals, run_check  # noqa: F401
from paddlescience_tpu.utils.ema import ExponentialMovingAverage, StochasticWeightAverage  # noqa: F401
from paddlescience_tpu.utils.misc import AverageMeter, Timer, all_gather, set_random_seed  # noqa: F401
from paddlescience_tpu.utils.symbolic import lambdify  # noqa: F401
