from .harness import BenchFilter, BenchRegistry, StepList
