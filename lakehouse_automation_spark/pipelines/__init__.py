from .datagen import generate_survey, write_survey_csv
from .ledger import Ledger
from .retention import retention_sweep

__all__ = ["generate_survey", "write_survey_csv", "Ledger", "retention_sweep"]
