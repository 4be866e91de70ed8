from hydrochrono_tpu.scene.yaml import (  # noqa: F401
    SetupSpec,
    find_setup_file,
    parse_hydro_file,
    parse_model_file,
    parse_setup_file,
    parse_simulation_file,
)
from hydrochrono_tpu.scene.builder import build_case, Case  # noqa: F401
