"""Problem families (SURVEY.md §2.1): the four reference configurations."""

from . import attitude, kirk, pos_att, position, thrusters

__all__ = ["kirk", "position", "attitude", "pos_att", "thrusters"]
