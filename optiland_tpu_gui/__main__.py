"""`python -m optiland_tpu_gui` launches the GUI (reference wires the
`optiland` console script to `run_gui:main` in its pyproject)."""

import sys

from optiland_tpu_gui.run_gui import main

sys.exit(main())
