"""``python -m asr_training_data_pipeline_spark`` → the pipeline CLI."""

from .cli import main

raise SystemExit(main())
