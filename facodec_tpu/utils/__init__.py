from facodec_tpu.utils.config import AttrDict, load_config, recursive_attrdict  # noqa: F401
