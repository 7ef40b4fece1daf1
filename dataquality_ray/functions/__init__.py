"""Pure, deterministic model/function definitions shared by the Ray stages
and the single-process oracle: language-ID, n-gram LM, sketches."""
