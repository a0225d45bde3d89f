from .locator import (
    Foreground,
    Locator,
    LocatorState,
    cluster,
    make_state,
    project_cloud,
    search,
    search_one,
    update,
)

__all__ = [
    "Foreground",
    "Locator",
    "LocatorState",
    "cluster",
    "make_state",
    "project_cloud",
    "search",
    "search_one",
    "update",
]
