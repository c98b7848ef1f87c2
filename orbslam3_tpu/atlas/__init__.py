"""Map data model: fixed-capacity SoA map store, Atlas, keyframe database."""
