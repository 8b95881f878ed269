"""Neural models: Conformer-CTC acoustic model + learned neural beamformer
(BASELINE.json config 5, stretch)."""
