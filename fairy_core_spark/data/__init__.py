"""Static public data snapshots shipped with the engine (suffix lists,
anchor vectors). Data-only modules: no Spark imports."""
