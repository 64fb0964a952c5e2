from stil_tta_tpu.config.loader import Config, load_config, parse_overrides
