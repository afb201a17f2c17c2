"""models: the flagship downlink-trigger detection pipeline."""

from .api import Trigger, search  # noqa: F401
from .multi import MultiTrigger  # noqa: F401
from .trigger import (StepOutput, TriggerState, init_state, scan_engine,  # noqa: F401
                      scan_pass)
