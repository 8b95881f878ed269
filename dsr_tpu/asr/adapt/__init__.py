"""Speaker adaptation: MLLR mean transforms and fMLLR (CMLLR) feature
transforms (reference `asr/adapt/` [K])."""
