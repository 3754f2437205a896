"""Deterministic capstone-shaped fixtures (FIXTURES.md groups A1-A4).

Synthesizes the reference's four raw inputs with their real-world quirks —
melted race rows, missing race rows, invalid IATA codes ('0', '-', null),
non-US rows, SAS day-offset dates, null genders, 'XXX' ports — so the whole
prep pipeline and the three flagship queries run end-to-end in tests without
the (absent) original data files. Seeded `random.Random` → stable across
runs and machines.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from . import schemas

STATES = [
    ("Georgia", "GA"), ("California", "CA"), ("Texas", "TX"),
    ("New York", "NY"), ("Washington", "WA"), ("Illinois", "IL"),
]
CITIES = [
    "Atlanta", "Savannah", "Los Angeles", "San Diego", "Houston", "Austin",
    "New York", "Buffalo", "Seattle", "Spokane", "Chicago", "Springfield",
]
RACES = [
    "White", "Hispanic or Latino", "Asian",
    "American Indian and Alaska Native", "Black or African-American",
]


def _city_state_pairs() -> list[tuple[str, str, str]]:
    out = []
    for i, city in enumerate(CITIES):
        state, code = STATES[i // 2]
        out.append((city, state, code))
    # duplicate city name in a second state (quirk: same-name cities)
    out.append(("Springfield", "Texas", "TX"))
    return out


def cities_demographics(spark: SparkSession, seed: int = 7) -> DataFrame:
    """Melted demographics rows (A1). One city is missing a race row."""
    rng = random.Random(seed)
    rows = []
    for idx, (city, state, code) in enumerate(_city_state_pairs()):
        pop = rng.randrange(50_000, 2_000_000)
        male = int(pop * rng.uniform(0.45, 0.55))
        # demographics are constant across a city's race rows (as in the
        # real melted file); only Race/Count vary
        demo = (
            city, state, round(rng.uniform(25, 45), 1),
            float(male), float(pop - male), pop,
            float(int(pop * rng.uniform(0.02, 0.1))),
            float(int(pop * rng.uniform(0.05, 0.4))),
            round(rng.uniform(2.0, 3.5), 2), code,
        )
        rows_for_city = RACES[1:] if idx == 3 else RACES  # drop a race once
        for race in rows_for_city:
            rows.append((*demo, race, int(pop * rng.uniform(0.05, 0.6))))
    # duplicated (city,state) group (all 5 races) with conflicting median
    # age — exercises the first-wins dedup (reference dataprep.py:40)
    city0 = [r for r in rows if (r[0], r[1]) == (rows[0][0], rows[0][1])]
    for r in city0:
        rows.append((r[0], r[1], 99.9, *r[3:]))
    return spark.createDataFrame(rows, schemas.STAGING_CITIES)


def airport_codes(spark: SparkSession, seed: int = 11) -> DataFrame:
    """Airport codes (A2) with invalid-IATA and non-US quirks."""
    rng = random.Random(seed)
    rows = []
    pairs = _city_state_pairs()
    # two unique IATA codes per (city,state) pair, deterministic
    iata_pool = iter(
        ["ATL", "SAV", "LAX", "SAN", "HOU", "AUS", "JFK", "BUF", "SEA",
         "GEG", "ORD", "SGF", "SGR", "PIT", "MSY", "DEN", "PDX", "SLC",
         "BOI", "TUS", "ABQ", "OKC", "TUL", "MEM", "BNA", "CLT", "RDU",
         "IAD", "BWI", "PHL"]
    )
    for city, state, code in pairs:
        for k in range(2):
            iata = next(iata_pool, None)
            lon = round(rng.uniform(-125, -70), 5)
            lat = round(rng.uniform(25, 49), 5)
            rows.append(
                (
                    f"K{iata or city[:3].upper()}",
                    rng.choice(["large_airport", "small_airport", "heliport"]),
                    f"{city} {'Intl' if k == 0 else 'Municipal'} Airport",
                    float(rng.randrange(0, 6000)),
                    "NA", "US", f"US-{code}", city,
                    f"K{iata or city[:3].upper()}",
                    iata, iata, f"{lon}, {lat}",
                )
            )
    # quirks: null / '0' / '-' IATA, non-US row
    rows += [
        ("KZZZ", "small_airport", "No Iata Field", 100.0, "NA", "US",
         "US-GA", "Atlanta", "KZZZ", None, None, "-84.0, 33.0"),
        ("KZR0", "small_airport", "Zero Iata Field", 100.0, "NA", "US",
         "US-CA", "Los Angeles", "KZR0", "0", "0", "-118.0, 34.0"),
        ("KDSH", "small_airport", "Dash Iata Field", 100.0, "NA", "US",
         "US-TX", "Houston", "KDSH", "-", "-", "-95.0, 29.0"),
        ("EGLL", "large_airport", "Heathrow", 83.0, "EU", "GB",
         "GB-ENG", "London", "EGLL", "LHR", "LHR", "-0.46, 51.47"),
    ]
    return spark.createDataFrame(rows, schemas.STAGING_AIRPORTS)


def global_temperatures(spark: SparkSession, seed: int = 13) -> DataFrame:
    """Temperature history (A3): multi-year per (city,month), nulls, non-US."""
    rng = random.Random(seed)
    rows = []
    for city, _state, _code in _city_state_pairs():
        for year in (2011, 2012, 2013):
            for month in (1, 4, 7):
                temp = round(rng.uniform(-5, 30), 3)
                null_row = rng.random() < 0.05
                rows.append(
                    (
                        f"{year}-{month:02d}-01",
                        None if null_row else temp,
                        None if null_row else round(rng.uniform(0.1, 1.5), 3),
                        city, "United States",
                        f"{round(rng.uniform(25, 49), 2)}N",
                        f"{round(rng.uniform(70, 125), 2)}W",
                    )
                )
    rows.append(("2013-04-01", 11.2, 0.3, "London", "United Kingdom", "51.47N", "0.46W"))
    return spark.createDataFrame(rows, schemas.STAGING_TEMPERATURES)


def i94_travelers(spark: SparkSession, n: int = 500, seed: int = 17) -> DataFrame:
    """SAS-shaped traveler rows (A4): XXX ports, unknown ports, null fields."""
    rng = random.Random(seed)
    ports = ["ATL", "LAX", "JFK", "SEA", "ORD", "HOU", "SAN", "AUS",
             "XXX", "QQQ"]  # XXX invalid; QQQ has no airport row
    rows = []
    for _ in range(n):
        port = rng.choice(ports)
        birth = rng.randrange(1940, 2010)
        # apr 2016 in SAS days-since-1960 (reference config.cfg:20)
        arr = float(20545 + rng.randrange(0, 30))
        rows.append(
            (
                port,
                None if rng.random() < 0.02 else arr,
                float(2016 - birth),
                float(rng.choice([1, 2, 3])),
                float(birth),
                None if rng.random() < 0.14 else rng.choice(["M", "F"]),
            )
        )
    return spark.createDataFrame(rows, schemas.STAGING_TRAVELERS)


def all_staging(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "cities": cities_demographics(spark),
        "airports": airport_codes(spark),
        "temperatures": global_temperatures(spark),
        "travelers": i94_travelers(spark),
    }
