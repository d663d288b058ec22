from vdnerf_tpu.utils.hocon import Config, load_conf, parse_string

__all__ = ["Config", "load_conf", "parse_string"]
