# -*- coding: utf-8 -*-
"""Curated CJK variant-character table.

Format mirrors the reference's ``variants.txt`` parsing rule (one group per
line, FIRST character is the canonical 正字 form; every character on the line
maps to it — reference ``core/variants.py:1219-1232``), but the data below is
our own small curated set of well-known variant groups (public knowledge),
NOT the reference's embedded 10,556-line table. The engine accepts any table
in this format, so a production deployment can drop in a larger one.
"""

# One variant group per line; first char = canonical.
VARIANTS_TEXT = """\
奇竒
藏蔵
為爲为
回囘囬
並竝并
裏裡
雞鷄
群羣
峰峯
略畧
夠够
線綫
著着
污汙
鋪舖
唇脣
杯盃
棄弃
恥耻
冊册
床牀
村邨
妒妬
淚泪
梁樑
留畱
綿緜
麼么
秘祕
念唸
棲栖
溪谿
仙僊
席蓆
煙烟菸
岩巖
豔艷艶
異异
踴踊
遊游
岳嶽
災灾
證証
週周
蹤踪
姪侄
妝粧
修脩
敘敍叙
濕溼
升昇陞
"""
