from hdsdp_tpu.models.problem import SDPProblem, ConeGroupData, LPConeData

__all__ = ["SDPProblem", "ConeGroupData", "LPConeData"]
