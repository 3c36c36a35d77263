from . import boxes, misc
