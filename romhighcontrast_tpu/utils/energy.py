"""Energy / CO2 accounting — measured where the platform allows, modeled
(and labeled as such) where it does not.

The reference tracks experiment energy and CO2 through eco2ai via
PerplexityLab (reference: NonLinearROM.py:116-122,196-197).  eco2ai itself
measures *utilization* (CPU fraction, GPU counters) and multiplies by rated
power — a utilization-fed model.  This tracker does the same, honestly
labeled per component:

* **host CPU (measured when available)** — RAPL energy counters
  (``/sys/class/powercap/intel-rapl*/energy_uj``) when the platform exposes
  them.  On this project's target host (a cloud VM driving a remote TPU
  through the axon tunnel) RAPL and hwmon are both absent (verified
  2026-08-18: ``/sys/class/powercap`` does not exist), so the tracker falls
  back to *measured utilization* sampled from ``/proc/stat`` +
  ``/proc/self/stat`` times a configurable CPU TDP — exactly eco2ai's
  method, flagged ``host_measured=False``.
* **TPU device (always modeled)** — the chip sits on the far side of a
  network tunnel; no local counter can observe it.  Reported as
  device-seconds x configurable board power (default: TPU v5e ~200 W/chip
  typical) and flagged as a model.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass, field


def _rapl_read_uj():
    """Total RAPL package energy in microjoules, or None if unavailable."""
    paths = glob.glob("/sys/class/powercap/intel-rapl:*/energy_uj")
    if not paths:
        return None
    total = 0
    try:
        for p in paths:
            with open(p) as f:
                total += int(f.read().strip())
    except OSError:
        return None
    return total


def _proc_stat_jiffies():
    """(busy, total) jiffies across all CPUs from /proc/stat, or None."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(v) for v in parts]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
        return sum(vals) - idle, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _self_cpu_seconds():
    """This process's user+system CPU seconds."""
    t = os.times()
    return t.user + t.system


@dataclass
class EnergyTracker:
    """Accumulates wall/device/CPU time and converts to kWh / kgCO2.

    Usage::

        tracker = EnergyTracker(num_devices=8)
        with tracker:
            run_experiment()
        print(tracker.report())
    """

    watts_per_device: float = 200.0
    num_devices: int = 1
    grid_kg_co2_per_kwh: float = 0.055  # default: low-carbon DC grid
    host_cpu_tdp_watts: float = 105.0   # per-socket model for the fallback
    seconds: float = 0.0
    #: process CPU-seconds accumulated inside tracked regions (measured)
    cpu_seconds: float = 0.0
    #: host CPU utilization over tracked regions, 0..1 (measured, /proc)
    host_utilization: float = 0.0
    #: RAPL-measured host energy in kWh (None -> RAPL unavailable)
    host_energy_measured_kwh: float | None = None
    _t0: float | None = field(default=None, repr=False)
    _cpu0: float = field(default=0.0, repr=False)
    _jif0: tuple | None = field(default=None, repr=False)
    _rapl0: int | None = field(default=None, repr=False)

    @property
    def host_measured(self) -> bool:
        """True iff host energy comes from a hardware counter (RAPL)."""
        return self.host_energy_measured_kwh is not None

    def __enter__(self):
        self._t0 = time.time()
        self._cpu0 = _self_cpu_seconds()
        self._jif0 = _proc_stat_jiffies()
        self._rapl0 = _rapl_read_uj()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self._t0
        self.seconds += dt
        self.cpu_seconds += _self_cpu_seconds() - self._cpu0
        jif1 = _proc_stat_jiffies()
        if self._jif0 is not None and jif1 is not None:
            db = jif1[0] - self._jif0[0]
            dtot = jif1[1] - self._jif0[1]
            if dtot > 0:
                # time-weighted running utilization over all tracked regions
                w = dt / self.seconds
                self.host_utilization = (
                    (1 - w) * self.host_utilization + w * db / dtot)
        rapl1 = _rapl_read_uj()
        if self._rapl0 is not None and rapl1 is not None:
            gained = max(rapl1 - self._rapl0, 0) / 3.6e12  # uJ -> kWh
            self.host_energy_measured_kwh = (
                (self.host_energy_measured_kwh or 0.0) + gained)
        self._t0 = None
        return False

    @property
    def host_energy_kwh(self) -> float:
        """RAPL measurement when available; else measured-utilization x TDP
        (eco2ai's method — a model fed by the measured CPU fraction)."""
        if self.host_energy_measured_kwh is not None:
            return self.host_energy_measured_kwh
        return (self.seconds * self.host_utilization
                * self.host_cpu_tdp_watts / 3.6e6)

    @property
    def device_energy_kwh(self) -> float:
        """Modeled: the TPU is remote (axon tunnel) — no local counter."""
        return self.seconds * self.watts_per_device * self.num_devices / 3.6e6

    @property
    def electricity_consumption_kWh(self) -> float:
        return self.device_energy_kwh + self.host_energy_kwh

    @property
    def CO2kg(self) -> float:
        return self.electricity_consumption_kWh * self.grid_kg_co2_per_kwh

    def report(self) -> str:
        host_tag = "measured (RAPL)" if self.host_measured else (
            f"modeled from measured {100 * self.host_utilization:.0f}% "
            "CPU utilization (RAPL unavailable on this host)")
        return (
            f"device time: {self.seconds:.2f}s x {self.num_devices} "
            f"device(s) [device power modeled: remote chip]; "
            f"host CPU {self.cpu_seconds:.2f}s, host energy "
            f"~{self.host_energy_kwh:.6f} kWh [{host_tag}]; "
            f"total ~{self.electricity_consumption_kWh:.6f} kWh; "
            f"CO2 ~{self.CO2kg:.6f} kg"
        )
