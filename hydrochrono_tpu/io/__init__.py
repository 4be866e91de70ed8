from hydrochrono_tpu.io.bemio import HydroData, load_bemio_h5  # noqa: F401
