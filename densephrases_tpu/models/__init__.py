from densephrases_tpu.models.bert import BertConfig, init_bert_params, bert_forward
from densephrases_tpu.models.encoder import PhraseEncoder
