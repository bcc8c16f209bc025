from .pedestrian_terrain import PedestrianTerrainEnv, EnvConfig, EnvState  # noqa: F401
