from raytracer_tpu.utils.ppm import write_ppm, read_ppm

__all__ = ["write_ppm", "read_ppm"]
