from vo_tpu.engine.vo import VOConfig, VOEngine, VOState, VOStepDiagnostics
