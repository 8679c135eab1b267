from masterthesis_tpu.ops.pallas.adain import fused_adain, pallas_available  # noqa: F401
