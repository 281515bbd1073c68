"""CJK transliteration tables for ascii_fold (F1 unidecode parity).

The reference normalizes author/affiliation strings with ``unidecode``
(check_landing_page_author_affiliation_parsing_against_openalex.py:16-27),
which transliterates Han characters to Mandarin pinyin rendered as
title-case ASCII plus a trailing space ('中' -> 'Zhong ') and kana to
per-character Hepburn romaji ('き' -> 'ki', digraphs naively per char:
'きゃ' -> 'kiya'). Both survive the downstream ``[^a-z0-9\\s]`` strip, so
"dropped by the regex anyway" is NOT a valid out-of-scope argument — a
CJK-named author must normalize to comparable non-empty text here too.

Coverage and divergence policy (tested in test_kernels.py):

- **kana**: complete for the standard hiragana (U+3041-U+3096) and katakana
  (U+30A1-U+30F6, plus the prolonged-sound mark). Same per-character naive
  romaji scheme as unidecode's x30 table. The katakana middle dot (U+30FB,
  a name-part separator) maps to a space — a deliberate token boundary.
- **Han**: the ``HAN_PINYIN`` table below covers the frequent range for this
  domain — the ~100 most common Chinese surnames plus high-frequency
  characters of institution/journal/place/given names (simplified and
  traditional forms) — in unidecode's exact output format, extended (r4)
  with the ~250 characters that dominate RUNNING Chinese text. Measured
  coverage (both rates asserted + printed in test_kernels.py::
  test_ascii_fold_han_frequency_weighted_agreement_rate): 0.952 of the
  top-250 corpus-frequency character SET folds to non-empty pinyin, and
  0.936 TOKEN-FREQUENCY-WEIGHTED under the Zipf 1/rank proxy over that
  public descending-rank list (running-text char frequencies are
  ~Zipfian; the proxy is deterministic and fully stated — no invented
  counts). The weighted rate is lower by design: every miss is one of
  the 12 documented high-rank heteronym exclusions. A gated differential
  vs real unidecode runs wherever that library exists.
  Characters outside the table are DROPPED (a documented divergence from
  unidecode, which ships the full CJK range); heteronyms whose unidecode
  pick is uncertain — 了 地 得 着 长 行 还 都 重 便 什 么 — are
  deliberately excluded rather than guessed.
"""

from __future__ import annotations

# --- kana -------------------------------------------------------------------

_HIRAGANA = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "wi", "ゑ": "we", "を": "wo", "ん": "n",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    # small forms: unidecode maps them like their full-size counterparts
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "ゃ": "ya", "ゅ": "yu", "ょ": "yo", "ゎ": "wa", "っ": "tsu",
    "ゔ": "vu", "ゕ": "ka", "ゖ": "ke",
}

# katakana block sits exactly 0x60 above hiragana for the shared grid
KANA: dict[str, str] = dict(_HIRAGANA)
KANA.update({chr(ord(h) + 0x60): r for h, r in _HIRAGANA.items()})
KANA.update({
    "ー": "-",   # prolonged sound mark (unidecode: '-')
    "ヵ": "ka", "ヶ": "ke",
    "・": " ",   # middle dot: name-part separator -> token boundary
})

# --- Han -> pinyin (unidecode output format: 'Xxx ' with trailing space) ----

HAN_PINYIN: dict[str, str] = {c: p + " " for c, p in {
    # ~100 most common surnames (simplified / traditional where they differ)
    "王": "Wang", "李": "Li", "张": "Zhang", "張": "Zhang", "刘": "Liu",
    "劉": "Liu", "陈": "Chen", "陳": "Chen", "杨": "Yang", "楊": "Yang",
    "黄": "Huang", "黃": "Huang", "赵": "Zhao", "趙": "Zhao", "吴": "Wu",
    "吳": "Wu", "周": "Zhou", "徐": "Xu", "孙": "Sun", "孫": "Sun",
    "马": "Ma", "馬": "Ma", "朱": "Zhu", "胡": "Hu", "郭": "Guo",
    "何": "He", "林": "Lin", "高": "Gao", "罗": "Luo", "羅": "Luo",
    "郑": "Zheng", "鄭": "Zheng", "梁": "Liang", "谢": "Xie", "謝": "Xie",
    "宋": "Song", "唐": "Tang", "许": "Xu", "許": "Xu", "邓": "Deng",
    "鄧": "Deng", "冯": "Feng", "馮": "Feng", "韩": "Han", "韓": "Han",
    "曹": "Cao", "曾": "Zeng", "彭": "Peng", "萧": "Xiao", "蕭": "Xiao",
    "蔡": "Cai", "潘": "Pan", "田": "Tian", "董": "Dong", "袁": "Yuan",
    "于": "Yu", "余": "Yu", "叶": "Ye", "葉": "Ye", "蒋": "Jiang",
    "蔣": "Jiang", "杜": "Du", "苏": "Su", "蘇": "Su", "魏": "Wei",
    "程": "Cheng", "丁": "Ding", "任": "Ren", "沈": "Shen", "姚": "Yao",
    "卢": "Lu", "盧": "Lu", "姜": "Jiang", "崔": "Cui", "谭": "Tan",
    "譚": "Tan", "陆": "Lu", "陸": "Lu", "汪": "Wang", "范": "Fan",
    "金": "Jin", "石": "Shi", "廖": "Liao", "贾": "Jia", "賈": "Jia",
    "夏": "Xia", "韦": "Wei", "韋": "Wei", "傅": "Fu", "方": "Fang",
    "白": "Bai", "邹": "Zou", "鄒": "Zou", "孟": "Meng", "熊": "Xiong",
    "秦": "Qin", "邱": "Qiu", "江": "Jiang", "尹": "Yin", "薛": "Xue",
    "段": "Duan", "雷": "Lei", "侯": "Hou", "龙": "Long", "龍": "Long",
    "史": "Shi", "陶": "Tao", "黎": "Li", "贺": "He", "賀": "He",
    "顾": "Gu", "顧": "Gu", "毛": "Mao", "郝": "Hao", "邵": "Shao",
    "万": "Wan", "萬": "Wan", "钱": "Qian", "錢": "Qian", "武": "Wu",
    "戴": "Dai", "莫": "Mo", "孔": "Kong", "向": "Xiang", "汤": "Tang",
    "湯": "Tang", "吕": "Lu", "呂": "Lu",
    # numbers, time, geography
    "一": "Yi", "二": "Er", "三": "San", "四": "Si", "五": "Wu",
    "六": "Liu", "七": "Qi", "八": "Ba", "九": "Jiu", "十": "Shi",
    "百": "Bai", "千": "Qian", "年": "Nian", "月": "Yue", "日": "Ri",
    "中": "Zhong", "国": "Guo", "國": "Guo", "北": "Bei", "京": "Jing",
    "上": "Shang", "海": "Hai", "南": "Nan", "西": "Xi", "东": "Dong",
    "東": "Dong", "山": "Shan", "广": "Guang", "廣": "Guang", "州": "Zhou",
    "深": "Shen", "圳": "Zhen", "天": "Tian", "津": "Jin", "庆": "Qing",
    "慶": "Qing", "成": "Cheng", "杭": "Hang", "安": "An", "徽": "Hui",
    "福": "Fu", "建": "Jian", "浙": "Zhe", "湖": "Hu", "河": "He",
    "省": "Sheng", "市": "Shi", "县": "Xian", "縣": "Xian", "区": "Qu",
    "區": "Qu", "云": "Yun", "雲": "Yun", "贵": "Gui", "貴": "Gui",
    "川": "Chuan", "藏": "Zang", "新": "Xin", "疆": "Jiang", "港": "Gang",
    "台": "Tai", "湾": "Wan", "灣": "Wan", "汉": "Han", "漢": "Han",
    # academia / publishing / institutions
    "大": "Da", "学": "Xue", "學": "Xue", "院": "Yuan", "科": "Ke",
    "技": "Ji", "研": "Yan", "究": "Jiu", "所": "Suo", "人": "Ren",
    "民": "Min", "文": "Wen", "化": "Hua", "生": "Sheng", "物": "Wu",
    "医": "Yi", "醫": "Yi", "药": "Yao", "藥": "Yao", "理": "Li",
    "工": "Gong", "信": "Xin", "息": "Xi", "电": "Dian", "電": "Dian",
    "子": "Zi", "计": "Ji", "計": "Ji", "算": "Suan", "机": "Ji",
    "機": "Ji", "数": "Shu", "數": "Shu", "据": "Ju", "期": "Qi",
    "刊": "Kan", "报": "Bao", "報": "Bao", "论": "Lun", "論": "Lun",
    "志": "Zhi", "杂": "Za", "雜": "Za", "誌": "Zhi", "社": "She",
    "会": "Hui", "會": "Hui", "出": "Chu", "版": "Ban", "教": "Jiao",
    "育": "Yu", "师": "Shi", "師": "Shi", "农": "Nong", "農": "Nong",
    "业": "Ye", "業": "Ye", "环": "Huan", "環": "Huan", "境": "Jing",
    "材": "Cai", "料": "Liao", "能": "Neng", "源": "Yuan", "管": "Guan",
    "经": "Jing", "經": "Jing", "济": "Ji", "濟": "Ji", "法": "Fa",
    "政": "Zheng", "治": "Zhi", "哲": "Zhe", "心": "Xin", "语": "Yu",
    "語": "Yu", "言": "Yan", "外": "Wai", "现": "Xian", "現": "Xian",
    "代": "Dai", "应": "Ying", "應": "Ying", "用": "Yong", "基": "Ji",
    "础": "Chu", "礎": "Chu", "自": "Zi", "然": "Ran", "动": "Dong",
    "動": "Dong", "力": "Li", "统": "Tong", "統": "Tong",
    # frequent given-name characters
    "伟": "Wei", "偉": "Wei", "芳": "Fang", "娜": "Na", "敏": "Min",
    "静": "Jing", "靜": "Jing", "丽": "Li", "麗": "Li", "强": "Qiang",
    "強": "Qiang", "磊": "Lei", "军": "Jun", "軍": "Jun", "洋": "Yang",
    "勇": "Yong", "杰": "Jie", "傑": "Jie", "娟": "Juan", "涛": "Tao",
    "濤": "Tao", "明": "Ming", "超": "Chao", "秀": "Xiu", "霞": "Xia",
    "平": "Ping", "刚": "Gang", "剛": "Gang", "桂": "Gui", "英": "Ying",
    "华": "Hua", "華": "Hua", "玉": "Yu", "兰": "Lan", "蘭": "Lan",
    "红": "Hong", "紅": "Hong", "春": "Chun", "小": "Xiao", "光": "Guang",
    "飞": "Fei", "飛": "Fei", "波": "Bo", "宁": "Ning", "寧": "Ning",
    "永": "Yong", "雪": "Xue", "琴": "Qin", "晶": "Jing", "欣": "Xin",
    "晓": "Xiao", "曉": "Xiao", "凯": "Kai", "凱": "Kai", "鹏": "Peng",
    "鵬": "Peng", "宇": "Yu", "浩": "Hao", "佳": "Jia", "萌": "Meng",
    "思": "Si", "雨": "Yu", "涵": "Han", "嘉": "Jia", "怡": "Yi",
    "梦": "Meng", "夢": "Meng", "健": "Jian", "俊": "Jun", "彬": "Bin",
    "斌": "Bin", "辉": "Hui", "輝": "Hui", "慧": "Hui", "艺": "Yi",
    "藝": "Yi", "婷": "Ting", "琳": "Lin", "璐": "Lu", "倩": "Qian",
    "颖": "Ying", "穎": "Ying", "薇": "Wei", "蕾": "Lei", "丹": "Dan",
    # kanji frequent in Japanese names (unidecode romanizes Han by Mandarin
    # pinyin regardless of language — '東京' -> 'Dong Jing ')
    "太": "Tai", "郎": "Lang", "藤": "Teng", "佐": "Zuo", "木": "Mu",
    "村": "Cun", "本": "Ben", "野": "Ye", "井": "Jing", "原": "Yuan",
    "口": "Kou", "内": "Nei", "岛": "Dao", "島": "Dao", "崎": "Qi",
    "冈": "Gang", "岡": "Gang", "松": "Song", "竹": "Zhu", "梅": "Mei",
    "清": "Qing", "真": "Zhen", "由": "You", "美": "Mei", "香": "Xiang",
    "奈": "Nai", "介": "Jie", "助": "Zhu", "夫": "Fu", "雄": "Xiong",
    "男": "Nan", "和": "He", "幸": "Xing", "正": "Zheng", "直": "Zhi",
    "克": "Ke", "博": "Bo", "义": "Yi", "義": "Yi", "忠": "Zhong",
    "孝": "Xiao", "仁": "Ren", "德": "De", "智": "Zhi", "贤": "Xian",
    "賢": "Xian", "良": "Liang", "吉": "Ji", "昌": "Chang", "兴": "Xing",
    "興": "Xing", "荣": "Rong", "榮": "Rong", "泽": "Ze", "澤": "Ze",
    "洪": "Hong", "胜": "Sheng", "勝": "Sheng", "利": "Li", "富": "Fu",
    "青": "Qing", "紫": "Zi",
}.items()}

# --- high-frequency running-text Han (r4 extension) -------------------------
# The characters that dominate RUNNING Chinese text (function words, common
# verbs/nouns — membership per the public corpus-frequency lists, ~top 250)
# were outside the name/institution range above, capping frequency-weighted
# agreement with unidecode at ~34%. Each entry below has ONE dominant
# Mandarin syllable (chars whose readings differ only in tone are safe —
# pinyin-to-ASCII drops tone). True cross-syllable heteronyms
# (了 地 得 着 长 行 还 都 重 便 什 么) stay excluded per the policy above:
# a wrong-syllable guess is worse than a documented drop.
_HAN_RUNNING_TEXT: dict[str, str] = {
    "是": "Shi", "不": "Bu", "我": "Wo", "在": "Zai", "有": "You",
    "他": "Ta", "这": "Zhe", "來": "Lai", "来": "Lai", "个": "Ge",
    "個": "Ge", "到": "Dao", "说": "Shuo", "說": "Shuo", "们": "Men",
    "們": "Men", "你": "Ni", "道": "Dao", "也": "Ye", "时": "Shi",
    "時": "Shi", "就": "Jiu", "要": "Yao", "下": "Xia", "以": "Yi",
    "去": "Qu", "之": "Zhi", "过": "Guo", "過": "Guo", "家": "Jia",
    "对": "Dui", "對": "Dui", "可": "Ke", "她": "Ta", "里": "Li",
    "後": "Hou", "后": "Hou", "多": "Duo", "而": "Er", "好": "Hao",
    "没": "Mei", "沒": "Mei", "起": "Qi", "事": "Shi", "作": "Zuo",
    "当": "Dang", "當": "Dang", "想": "Xiang", "看": "Kan", "无": "Wu",
    "無": "Wu", "开": "Kai", "開": "Kai", "手": "Shou", "主": "Zhu",
    "又": "You", "如": "Ru", "前": "Qian", "见": "Jian", "見": "Jian",
    "头": "Tou", "頭": "Tou", "面": "Mian", "公": "Gong", "同": "Tong",
    "已": "Yi", "老": "Lao", "从": "Cong", "從": "Cong", "两": "Liang",
    "兩": "Liang", "知": "Zhi", "样": "Yang", "樣": "Yang", "但": "Dan",
    "身": "Shen", "些": "Xie", "意": "Yi", "进": "Jin", "進": "Jin",
    "把": "Ba", "此": "Ci", "实": "Shi", "實": "Shi", "回": "Hui",
    "点": "Dian", "點": "Dian", "其": "Qi", "声": "Sheng", "聲": "Sheng",
    "全": "Quan", "己": "Ji", "话": "Hua", "話": "Hua", "儿": "Er",
    "兒": "Er", "者": "Zhe", "情": "Qing", "部": "Bu", "名": "Ming",
    "定": "Ding", "问": "Wen", "問": "Wen", "给": "Gei", "給": "Gei",
    "等": "Deng", "很": "Hen", "最": "Zui", "间": "Jian", "間": "Jian",
    "打": "Da", "位": "Wei", "因": "Yin", "被": "Bei", "走": "Zou",
    "第": "Di", "门": "Men", "門": "Men", "次": "Ci", "使": "Shi",
    "再": "Zai", "听": "Ting", "聽": "Ting", "世": "Shi", "气": "Qi",
    "氣": "Qi", "少": "Shao", "关": "Guan", "關": "Guan", "并": "Bing",
    "並": "Bing", "加": "Jia", "却": "Que", "卻": "Que", "产": "Chan",
    "產": "Chan", "入": "Ru", "先": "Xian", "水": "Shui", "眼": "Yan",
    "体": "Ti", "體": "Ti", "别": "Bie", "別": "Bie", "处": "Chu",
    "處": "Chu", "总": "Zong", "總": "Zong", "才": "Cai", "场": "Chang",
    "場": "Chang", "书": "Shu", "書": "Shu", "比": "Bi", "住": "Zhu",
    "员": "Yuan", "員": "Yuan", "笑": "Xiao", "性": "Xing", "通": "Tong",
    "目": "Mu", "立": "Li", "命": "Ming", "活": "Huo", "难": "Nan",
    "難": "Nan", "神": "Shen", "件": "Jian", "表": "Biao", "车": "Che",
    "車": "Che", "路": "Lu", "叫": "Jiao", "死": "Si", "常": "Chang",
    "提": "Ti", "感": "Gan", "更": "Geng", "反": "Fan", "题": "Ti",
    "題": "Ti", "必": "Bi", "该": "Gai", "該": "Gai", "交": "Jiao",
    "果": "Guo", "几": "Ji", "幾": "Ji", "女": "Nu", "只": "Zhi",
    "分": "Fen", "将": "Jiang", "將": "Jiang", "种": "Zhong",
    "種": "Zhong", "相": "Xiang", "发": "Fa", "發": "Fa", "与": "Yu",
    "與": "Yu", "的": "De", "为": "Wei", "為": "Wei", "那": "Na",
}
for _c, _p in _HAN_RUNNING_TEXT.items():
    # curated name/institution entries stay authoritative on overlap
    HAN_PINYIN.setdefault(_c, _p + " ")

assert all(len(c) == 1 for c in HAN_PINYIN), "HAN_PINYIN keys must be single chars"

CJK_TABLE: dict[str, str] = {**KANA, **HAN_PINYIN}
