from paddlescience_tpu.data.process.transform import Compose, build_transforms  # noqa: F401
