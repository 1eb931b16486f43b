"""GCP region latency probing (reference hub/google/__init__.py).

Picks the lowest-latency Google Cloud region for HUB training jobs. This
environment has no network egress, so the probe function is injectable:
the default prober measures a TCP connect to `{region}-docker.pkg.dev`
and degrades to +inf on failure (the reference returns inf on request
errors the same way), while tests pass a fake prober.
"""

from __future__ import annotations

import concurrent.futures as cf
import socket
import statistics
import time
from typing import Callable, List, Optional, Tuple

# region -> (tier, city, country); tier-1 regions host HUB trainers
REGIONS = {
    "asia-east1": (1, "Taiwan", "China"),
    "asia-east2": (2, "Hong Kong", "China"),
    "asia-northeast1": (1, "Tokyo", "Japan"),
    "asia-northeast2": (1, "Osaka", "Japan"),
    "asia-northeast3": (2, "Seoul", "South Korea"),
    "asia-south1": (2, "Mumbai", "India"),
    "asia-south2": (2, "Delhi", "India"),
    "asia-southeast1": (2, "Jurong West", "Singapore"),
    "asia-southeast2": (2, "Jakarta", "Indonesia"),
    "australia-southeast1": (2, "Sydney", "Australia"),
    "australia-southeast2": (2, "Melbourne", "Australia"),
    "europe-central2": (2, "Warsaw", "Poland"),
    "europe-north1": (1, "Hamina", "Finland"),
    "europe-southwest1": (1, "Madrid", "Spain"),
    "europe-west1": (1, "St. Ghislain", "Belgium"),
    "europe-west10": (2, "Berlin", "Germany"),
    "europe-west12": (2, "Turin", "Italy"),
    "europe-west2": (2, "London", "United Kingdom"),
    "europe-west3": (2, "Frankfurt", "Germany"),
    "europe-west4": (1, "Eemshaven", "Netherlands"),
    "europe-west6": (2, "Zurich", "Switzerland"),
    "europe-west8": (1, "Milan", "Italy"),
    "europe-west9": (1, "Paris", "France"),
    "me-central1": (2, "Doha", "Qatar"),
    "me-west1": (1, "Tel Aviv", "Israel"),
    "northamerica-northeast1": (2, "Montreal", "Canada"),
    "northamerica-northeast2": (2, "Toronto", "Canada"),
    "southamerica-east1": (2, "São Paulo", "Brazil"),
    "southamerica-west1": (2, "Santiago", "Chile"),
    "us-central1": (1, "Iowa", "United States"),
    "us-east1": (1, "South Carolina", "United States"),
    "us-east4": (1, "Northern Virginia", "United States"),
    "us-east5": (1, "Columbus", "United States"),
    "us-south1": (1, "Dallas", "United States"),
    "us-west1": (1, "Oregon", "United States"),
    "us-west2": (2, "Los Angeles", "United States"),
    "us-west3": (2, "Salt Lake City", "United States"),
    "us-west4": (2, "Las Vegas", "United States"),
}

Stats = Tuple[str, float, float, float, float]  # region, mean, std, min, max


def _tcp_probe(region: str, timeout: float = 5.0) -> float:
    """One latency sample (ms) to the region's artifact registry host;
    inf when unreachable (this host has no egress — callers inject a
    prober for tests)."""
    host = f"{region}-docker.pkg.dev"
    t0 = time.perf_counter()
    try:
        with socket.create_connection((host, 443), timeout=timeout):
            return (time.perf_counter() - t0) * 1000.0
    except OSError:
        return float("inf")


class GCPRegions:
    """Tier/latency analysis over GCP regions (reference GCPRegions)."""

    def __init__(self, probe: Callable[[str], float] = _tcp_probe):
        self.regions = dict(REGIONS)
        self._probe = probe

    def tier1(self) -> List[str]:
        return [r for r, info in self.regions.items() if info[0] == 1]

    def tier2(self) -> List[str]:
        return [r for r, info in self.regions.items() if info[0] == 2]

    def _ping_region(self, region: str, attempts: int = 1) -> Stats:
        lat = [s for s in (self._probe(region) for _ in range(attempts)) if s != float("inf")]
        if not lat:
            return region, float("inf"), float("inf"), float("inf"), float("inf")
        std = statistics.stdev(lat) if len(lat) > 1 else 0.0
        return region, statistics.mean(lat), std, min(lat), max(lat)

    def lowest_latency(
        self, top: int = 1, verbose: bool = False, tier: Optional[int] = None, attempts: int = 1
    ) -> List[Stats]:
        """Regions sorted by mean latency; returns the `top` best
        (region, mean, std, min, max) rows like the reference."""
        names = [r for r, v in self.regions.items() if v[0] == tier] if tier else list(self.regions)
        with cf.ThreadPoolExecutor(max_workers=min(50, len(names))) as ex:
            rows = list(ex.map(lambda r: self._ping_region(r, attempts), names))
        rows.sort(key=lambda s: s[1])
        if verbose:
            print(f"{'Region':<25} {'Location':<35} {'Tier':<5} Latency (ms)")
            for region, mean, std, mn, mx in rows:
                t, city, country = self.regions[region]
                loc = f"{city}, {country}"
                txt = "Timeout" if mean == float("inf") else f"{mean:.0f} ± {std:.0f} ({mn:.0f} - {mx:.0f})"
                print(f"{region:<25} {loc:<35} {t:<5} {txt}")
        return rows[:top]
