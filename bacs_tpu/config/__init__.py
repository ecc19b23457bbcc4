from bacs_tpu.config.core import Config, load_config, parse_overrides  # noqa: F401
