"""Ready-made model builders mirroring the reference demo suite
(reference: demos/sphere, demos/rm3, demos/oswec, demos/f3of, demos/DeepCWind).

Each builder returns a SystemSpec; pair it with a wave model and
`stepper.Simulation` to reproduce the corresponding demo.
"""

from hydrochrono_tpu.models.builders import (  # noqa: F401
    deepcwind_decay,
    f3of,
    oswec,
    rm3,
    sphere_decay,
    sphere_heave_constrained,
)
