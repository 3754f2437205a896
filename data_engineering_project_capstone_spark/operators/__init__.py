from .airports import prep_airports
from .cities import prep_cities
from .keys import hash_key, surrogate_key
from .star import build_star_schema
from .temperatures import prep_temperatures
from .travelers import prep_travelers

__all__ = [
    "build_star_schema",
    "hash_key",
    "prep_airports",
    "prep_cities",
    "prep_temperatures",
    "prep_travelers",
    "surrogate_key",
]
