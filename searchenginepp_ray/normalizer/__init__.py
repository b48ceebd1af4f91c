from .punctuation import remove_punctuation, ALL_MARKS, PUN_1_BYTE, PUN_2_BYTE, PUN_3_BYTE
from .latin1 import (fix_latin1_mojibake, looks_like_mojibake, lower_ascii, lower_latin1)
from .porter2 import stem
from .stop_words import STOP_WORDS
from .word_normalizer import normalize_tokens, term_frequencies
