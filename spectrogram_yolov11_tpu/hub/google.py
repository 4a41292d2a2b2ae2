"""GCP region latency picker (reference: hub/google/__init__.py:11
``GCPRegions``) — used to pick the closest region for HUB-hosted training.

TPU-native/zero-egress redesign: the probe is a raw TCP connect (stdlib
``socket``, no requests dependency) and is injectable, so the ranking logic
is testable offline; with no network every region reports ``inf`` and
``lowest_latency`` degrades gracefully instead of raising.
"""

from __future__ import annotations

import socket
import statistics
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Tuple

# region -> (tier, city, country); factual GCP table (same set the reference
# ships, hub/google/__init__.py:35-77)
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

RegionStats = Tuple[str, float, float, float, float]  # (region, mean, std, min, max) ms


def _tcp_probe(region: str, timeout: float = 3.0) -> float:
    """One TCP connect to the region's artifact endpoint; latency in ms
    (inf on failure — including the zero-egress case)."""
    host = f"{region}-docker.pkg.dev"
    t0 = time.perf_counter()
    try:
        with socket.create_connection((host, 443), timeout=timeout):
            return (time.perf_counter() - t0) * 1e3
    except OSError:
        return float("inf")


class GCPRegions:
    """Rank GCP regions by measured network latency (reference GCPRegions).

    ``probe`` is injectable: ``GCPRegions(probe=lambda region: ms)`` lets the
    selection logic run without any network.
    """

    def __init__(self, probe: Optional[Callable[[str], float]] = None):
        self.regions = dict(REGIONS)
        self._probe = probe or _tcp_probe

    def tier1(self) -> List[str]:
        return [r for r, info in self.regions.items() if info[0] == 1]

    def tier2(self) -> List[str]:
        return [r for r, info in self.regions.items() if info[0] == 2]

    def _ping_region(self, region: str, attempts: int = 1) -> RegionStats:
        lat = [v for v in (self._probe(region) for _ in range(max(1, attempts))) if v != float("inf")]
        if not lat:
            return region, float("inf"), float("inf"), float("inf"), float("inf")
        return region, statistics.mean(lat), statistics.stdev(lat) if len(lat) > 1 else 0.0, min(lat), max(lat)

    def lowest_latency(self, top: int = 1, verbose: bool = False, tier: Optional[int] = None,
                       attempts: int = 1) -> List[RegionStats]:
        """Probe (concurrently) and return the `top` lowest-mean-latency
        regions, optionally restricted to a tier."""
        names = [r for r, info in self.regions.items() if tier is None or info[0] == tier]
        with ThreadPoolExecutor(max_workers=min(32, len(names))) as ex:
            stats = list(ex.map(lambda r: self._ping_region(r, attempts), names))
        stats.sort(key=lambda s: s[1])
        if verbose:
            for region, mean, std, lo, hi in stats:
                tier_i, city, country = self.regions[region]
                print(f"{region:<25} t{tier_i} {city}, {country}: "
                      + ("unreachable" if mean == float("inf") else f"{mean:.0f}±{std:.0f} ms [{lo:.0f}-{hi:.0f}]"))
        return stats[: max(1, top)]
