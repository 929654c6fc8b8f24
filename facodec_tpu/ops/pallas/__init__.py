from facodec_tpu.ops.pallas.vq import nearest_code_pallas  # noqa: F401
