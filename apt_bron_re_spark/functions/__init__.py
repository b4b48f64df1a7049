"""Pure-Python and Column-level helper functions shared by the operators."""
