"""Energy / CO2 accounting.

The reference tracks experiment energy and CO2 through eco2ai via
PerplexityLab (reference: NonLinearROM.py:116-122,196-197).  That stack
measures host CPU/RAM draw; on TPU the meaningful quantity is device-seconds
x board power.  This tracker reports wall time, an energy estimate from a
configurable average board power (default: TPU v5e ~ 200 W/chip typical), and
a CO2 estimate from a configurable grid intensity.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class EnergyTracker:
    """Accumulates wall-clock device time and converts to kWh / kgCO2.

    Usage::

        tracker = EnergyTracker(num_devices=8)
        with tracker:
            run_experiment()
        print(tracker.report())
    """

    watts_per_device: float = 200.0
    num_devices: int = 1
    grid_kg_co2_per_kwh: float = 0.055  # default: low-carbon DC grid
    seconds: float = 0.0
    _t0: float | None = field(default=None, repr=False)

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.seconds += time.time() - self._t0
        self._t0 = None
        return False

    @property
    def electricity_consumption_kWh(self) -> float:
        return self.seconds * self.watts_per_device * self.num_devices / 3.6e6

    @property
    def CO2kg(self) -> float:
        return self.electricity_consumption_kWh * self.grid_kg_co2_per_kwh

    def report(self) -> str:
        return (
            f"device time: {self.seconds:.2f}s x {self.num_devices} device(s); "
            f"energy ~{self.electricity_consumption_kWh:.6f} kWh; "
            f"CO2 ~{self.CO2kg:.6f} kg"
        )
