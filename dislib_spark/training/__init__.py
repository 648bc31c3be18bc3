from dislib_spark.training.distributed import (
    EncapsulatedFunctionsDistributed,
    ParameterAveragingTrainer,
)

__all__ = ["EncapsulatedFunctionsDistributed", "ParameterAveragingTrainer"]
