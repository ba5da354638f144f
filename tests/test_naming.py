from pipelines_spark.naming import normalize_column_name, normalize_names


def test_accent_strip_and_lowercase():
    assert normalize_column_name("Raça_Cor") == "raca_cor"
    assert normalize_column_name("Ult_Movimentação") == "ult_movimentacao"
    assert normalize_column_name("Endereço") == "endereco"


def test_whitespace_and_punct_to_underscore():
    assert normalize_column_name("col name / x") == "col_name_x"


def test_leading_digit_prefixed():
    assert normalize_column_name("123coluna") == "_123coluna"


def test_empty_gets_positional():
    assert normalize_column_name("N°".replace("N", "").replace("°", ""), 4) == "col_4"


def test_collision_dedup():
    assert normalize_names(["a b", "a_b", "A  B"]) == ["a_b", "a_b_1", "a_b_2"]
