"""Article color palette (reference: python_util/plot/colors.py).

A fixed 52-color palette for article visualization, extended with the
shuffled CSS4 color names so arbitrarily many articles stay distinguishable.
"""
from __future__ import annotations

import random

DEFAULT_COLOR = "k"

COLORS = [
    "darkgreen", "red", "darkviolet", "darkblue",
    "gold", "darkorange", "brown", "yellowgreen", "darkcyan",

    "darkkhaki", "firebrick", "darkorchid", "deepskyblue",
    "peru", "orangered", "rosybrown", "burlywood", "cadetblue",

    "olivedrab", "palevioletred", "plum", "slateblue",
    "tan", "coral", "sienna", "yellow", "mediumaquamarine",

    "forestgreen", "indianred", "blueviolet", "steelblue",
    "silver", "salmon", "darkgoldenrod", "greenyellow", "darkturquoise",

    "mediumseagreen", "crimson", "rebeccapurple", "navy",
    "darkgray", "saddlebrown", "maroon", "lawngreen", "royalblue",

    "springgreen", "tomato", "violet", "azure",
    "goldenrod", "chocolate", "chartreuse", "teal",
]


def _extend_with_css4() -> None:
    try:
        from matplotlib import colors as mcolors
    except ImportError:
        return
    base = dict(mcolors.BASE_COLORS)
    base.pop(DEFAULT_COLOR, None)
    all_colors = dict(base, **mcolors.CSS4_COLORS)
    by_hsv = sorted(
        (tuple(mcolors.rgb_to_hsv(mcolors.to_rgba(c)[:3])), name)
        for name, c in all_colors.items())
    sorted_names = [name for _, name in by_hsv]
    rng = random.Random(501)
    rng.shuffle(sorted_names)
    for color in sorted_names:
        if color not in COLORS:
            COLORS.append(color)


_extend_with_css4()


def get_article_color(index: int) -> str:
    return COLORS[index % len(COLORS)]
