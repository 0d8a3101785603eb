"""Per-satellite ephemeris assembly from decoded subframes.

Replaces the reference's SatData class (src/gpslib.py:652-788):
accumulates subframes 1-3 into a complete ephemeris, cross-checks
IODC/IODE issue numbers to detect an ephemeris change mid-run, tracks
satellite health, and records the (tow, ST) time-reference table that
anchors pseudoranges to the sample clock.  Supports warm-starting from a
cached ephemeris dict (the JSON ephemeris cache, gpseval.py:58-106).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum

# field sets per subframe (reference gpslib.py:37-40)
EPHEM_SF1 = ("weekNum", "Tgd", "Toc", "af2", "af1", "af0", "IODC", "satAcc")
EPHEM_SF2 = ("Crs", "deltaN", "M0", "Cuc", "e", "Cus", "sqrtA", "Toe",
             "IODE2")
EPHEM_SF3 = ("Cic", "omegaBig", "Cis", "i0", "Crc", "omegaSmall",
             "omegaDot", "IDOT", "IODE3")


class SatStatus(IntEnum):
    OK = 0
    NOT_READY = 1
    NEW_EPHEM = 2
    FLAWED = 3
    UNHEALTHY = 4


@dataclass
class EphemerisAssembler:
    """Builds one satellite's ephemeris from a stream of subframe dicts."""

    sat_no: int
    preloaded: dict | None = None

    ephem: dict = field(default_factory=dict)
    time_refs: list = field(default_factory=list)   # [(tow, ST)]
    ephem_ok: bool = False
    loaded: bool = False
    status: SatStatus = SatStatus.OK
    _have: set = field(default_factory=set)
    _last_iodc8: int = -1
    _health: int = -1

    def __post_init__(self):
        if self.preloaded is not None:
            self.ephem = dict(self.preloaded)
            self.ephem["SAT"] = self.sat_no
            self.ephem_ok = True
            self.loaded = True
            self._have = {1, 2, 3}
            self._last_iodc8 = int(self.preloaded["IODC"]) & 255
            self._health = 0

    def _issue_check(self, sf: dict) -> SatStatus:
        """Health + IODC/IODE cross-subframe consistency
        (framesValid, gpslib.py:730-751)."""
        iodc8 = -1
        if sf["ID"] == 1:
            iodc8 = int(sf["IODC"]) & 255
            self._health = int(sf["satHealth"])
            if self._health != 0:
                return SatStatus.UNHEALTHY
        elif sf["ID"] == 2:
            iodc8 = int(sf["IODE2"])
        elif sf["ID"] == 3:
            iodc8 = int(sf["IODE3"])
        if iodc8 > -1:
            changed = self._last_iodc8 > -1 and iodc8 != self._last_iodc8
            self._last_iodc8 = iodc8
            if changed:
                return SatStatus.NEW_EPHEM
        return SatStatus.OK

    def read_subframe(self, sf: dict) -> SatStatus:
        """Consume one subframe dict (readSubframe, gpslib.py:754-788)."""
        self.status = self._issue_check(sf)
        if self.status != SatStatus.OK:
            return self.status

        if not self.ephem_ok:
            table = {1: EPHEM_SF1, 2: EPHEM_SF2, 3: EPHEM_SF3}
            sf_id = sf["ID"]
            if sf_id in table and sf_id not in self._have:
                for key in table[sf_id]:
                    self.ephem[key] = sf[key]
                self._have.add(sf_id)
            self.ephem_ok = self._have >= {1, 2, 3}
            self.loaded = False

        # A (tow, ST) reference is only trustworthy with a verified
        # ephemeris; for a *cached* ephemeris, subframes 4/5 carry no
        # IODC to validate against, so only IDs 1-3 set references
        # (gpslib.py:780-786).
        if (self.ephem_ok and not self.loaded) or \
                (self.loaded and sf["ID"] < 4):
            self.time_refs.append((int(sf["tow"]), int(sf["ST"])))
        return self.status
